"""DuckDB oracle SQL for the iterative fixed-point queries.

The driver verifies every contract query against an ANSI-SQL twin run
by DuckDB on the same parquet tables.  One-shot operators ship their
SQL next to the Spark code (``functions/*.py``, ``sources/events.py``);
this module covers the *iterative* algorithms — connected components,
SSSP, label propagation, converged PageRank, k-core peeling, greedy
coloring, FM diameter, and Lloyd's k-means — as **recursive CTEs with
the same convergence rules as the Spark loops**, so one static SQL
string is correct at any scale factor.

Why this is sound: every one of these algorithms is a monotone (or
deterministic) fixed-point iteration, and the Spark implementations
terminate exactly when the state stops changing (or a fixed superstep
budget runs out).  The recursive CTE reproduces the *dense* form of
each update; dense and frontier (active-set) schedules reach the same
fixed point for monotone monoids (min/label/peel), and for the
value-tracking ones (PageRank, LPA, k-means) the recursion replicates
the exact per-superstep update and stopping rule.

DuckDB specifics this relies on (verified against duckdb 1.0):
- joins, GROUP BY, and window functions are allowed in the recursive
  term, and the recursive table may be referenced more than once —
  every reference sees the previous iteration's rows only;
- each recursion level is tagged with an ``iter`` column and carries
  its own convergence metric (``nchanged`` / ``md``) in every row via a
  window aggregate, so the recursive term can gate the next level on
  the previous level's convergence state;
- a nested ``WITH`` does not resolve inside ``WITH RECURSIVE`` scope,
  hence the flattened ``EDGES_CTES`` from ``sources/events.py``.

Reference parity citations live with the Spark implementations in
``algos/``; each builder notes the algo it mirrors.
"""

from __future__ import annotations

from .sources.events import EDGES_CTES

# Shared graph preludes (events-derived edge table, engine-portable ids).
_VERTS = ("verts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges "
          "UNION ALL SELECT dst FROM edges))")
_SYM = ("sym AS (SELECT src, dst FROM edges "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges)")
_CANON = ("canon AS (SELECT DISTINCT least(src, dst) AS src, "
          "greatest(src, dst) AS dst FROM edges WHERE src <> dst)")


def _rec(*ctes: str) -> str:
    return "WITH RECURSIVE " + ",\n".join((EDGES_CTES.strip(),) + ctes) + "\n"


# ---------------------------------------------------------------------------
# connected components (mirrors algos/connected_components.py)
# ---------------------------------------------------------------------------

_CC_REC = """
cc(iter, id, component, nchanged) AS (
  SELECT 0, id, id, CAST(1 AS BIGINT) FROM verts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           least(p.component, coalesce(m.received, p.component)) AS component,
           sum(CASE WHEN coalesce(m.received, p.component) < p.component
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM cc p
    LEFT JOIN (SELECT s.dst AS mid, min(p2.component) AS received
               FROM cc p2 JOIN sym s ON p2.id = s.src
               GROUP BY s.dst) m ON p.id = m.mid
    WHERE p.nchanged > 0 AND p.iter < 200
  )
)"""


def sql_connected_components() -> str:
    return (_rec(_VERTS, _SYM, _CC_REC)
            + "SELECT id, component FROM cc "
              "WHERE iter = (SELECT max(iter) FROM cc)")


def sql_cc_sizes() -> str:
    return (_rec(_VERTS, _SYM, _CC_REC) + """
, final AS (SELECT id, component FROM cc
            WHERE iter = (SELECT max(iter) FROM cc)),
comp AS (SELECT component, count(*) AS size FROM final GROUP BY component)
SELECT size, count(*) AS n_components FROM comp GROUP BY size""")


# ---------------------------------------------------------------------------
# SSSP (mirrors algos/sssp.py; undirected, unit weights, finite rows only)
# ---------------------------------------------------------------------------

def sql_sssp_from_hub(source: int = -1) -> str:
    rec = f"""
sssp(iter, id, distance, nchanged) AS (
  SELECT 0, id, CAST(0.0 AS DOUBLE), CAST(1 AS BIGINT)
  FROM verts WHERE id = {source}
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, n.id, n.distance,
           sum(CASE WHEN q.id IS NULL OR n.distance < q.distance
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM (SELECT id, min(distance) AS distance FROM (
            SELECT id, distance FROM sssp
            UNION ALL
            SELECT s.dst AS id, p.distance + 1.0 AS distance
            FROM sssp p JOIN sym s ON p.id = s.src
          ) GROUP BY id) n
    LEFT JOIN sssp q ON n.id = q.id
    CROSS JOIN (SELECT DISTINCT iter, nchanged FROM sssp) m
    WHERE m.nchanged > 0 AND m.iter < 200
  )
)"""
    return (_rec(_VERTS, _SYM, rec)
            + "SELECT id, distance FROM sssp "
              "WHERE iter = (SELECT max(iter) FROM sssp)")


# ---------------------------------------------------------------------------
# label propagation (mirrors algos/label_propagation.py, 10-superstep cap)
# ---------------------------------------------------------------------------

def sql_lpa(max_supersteps: int = 10) -> str:
    rec = f"""
lpa(iter, id, label, nchanged) AS (
  SELECT 0, id, CAST(id AS VARCHAR), CAST(1 AS BIGINT) FROM verts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           coalesce(w.winner, p.label) AS label,
           sum(CASE WHEN coalesce(w.winner, p.label) <> p.label
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM lpa p
    LEFT JOIN (
      SELECT dst, winner FROM (
        SELECT s.dst, p2.label AS winner,
               row_number() OVER (PARTITION BY s.dst
                                  ORDER BY count(*) DESC, p2.label ASC) AS rn
        FROM lpa p2 JOIN sym s ON p2.id = s.src
        GROUP BY s.dst, p2.label
      ) WHERE rn = 1
    ) w ON p.id = w.dst
    WHERE p.nchanged > 0 AND p.iter < {max_supersteps}
  )
)"""
    return (_rec(_VERTS, _SYM, rec)
            + "SELECT id, label FROM lpa "
              "WHERE iter = (SELECT max(iter) FROM lpa)")


# ---------------------------------------------------------------------------
# PageRank to tolerance (mirrors algos/pagerank.py tol mode)
# ---------------------------------------------------------------------------

def sql_pagerank_converged(tol: float = 1e-6, max_supersteps: int = 200) -> str:
    outd = ("outd AS (SELECT src AS id, count(*) AS out_degree "
            "FROM edges GROUP BY 1)")
    cont = ("cont AS (SELECT e.src, e.dst, 1.0 / d.out_degree AS cw "
            "FROM edges e JOIN outd d ON e.src = d.id)")
    rec = f"""
pr(iter, id, rank, md) AS (
  SELECT 0, id, CAST(1.0 AS DOUBLE), CAST(1e12 AS DOUBLE) FROM verts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           0.15 + 0.85 * coalesce(m.t, 0.0) AS rank,
           max(abs(0.15 + 0.85 * coalesce(m.t, 0.0) - p.rank)) OVER () AS md
    FROM pr p
    LEFT JOIN (SELECT c.dst, sum(p2.rank * c.cw) AS t
               FROM pr p2 JOIN cont c ON p2.id = c.src
               GROUP BY c.dst) m ON p.id = m.dst
    WHERE p.md > {tol!r} AND p.iter < {max_supersteps}
  )
)"""
    return (_rec(_VERTS, outd, cont, rec)
            + "SELECT id, round(rank, 6) AS rank FROM pr "
              "WHERE iter = (SELECT max(iter) FROM pr)")


# ---------------------------------------------------------------------------
# k-core peeling (mirrors algos/kcore.py)
# ---------------------------------------------------------------------------

def _kcore_rec(name: str, src_rel: str, k: int, cap: int = 100) -> str:
    """One recursive peel.  Every level is LEFT-JOINed from a single meta
    row so an emptied core still yields one (NULL, NULL) row — recursion
    then stops on the next level (count stable at 0) instead of dying
    with the wrong (last non-empty) level."""
    return f"""
{name}(iter, src, dst, n, changed) AS (
  SELECT 0, e.src, e.dst, count(e.src) OVER (), TRUE
  FROM (SELECT 1 AS one) o LEFT JOIN ({src_rel}) e ON TRUE
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, e.src, e.dst,
           count(e.src) OVER () AS n,
           count(e.src) OVER () <> m.n AS changed
    FROM (SELECT DISTINCT iter, n, changed FROM {name}) m
    LEFT JOIN (
      SELECT p.src, p.dst FROM {name} p
      JOIN (SELECT id FROM (SELECT src AS id FROM {name} WHERE src IS NOT NULL
                            UNION ALL
                            SELECT dst FROM {name} WHERE dst IS NOT NULL)
            GROUP BY id HAVING count(*) >= {k}) ks ON p.src = ks.id
      JOIN (SELECT id FROM (SELECT src AS id FROM {name} WHERE src IS NOT NULL
                            UNION ALL
                            SELECT dst FROM {name} WHERE dst IS NOT NULL)
            GROUP BY id HAVING count(*) >= {k}) kd ON p.dst = kd.id
    ) e ON TRUE
    WHERE m.changed AND m.iter < {cap}
  )
)"""


def _kcore_final(name: str) -> str:
    return (f"SELECT src, dst FROM {name} "
            f"WHERE iter = (SELECT max(iter) FROM {name}) AND src IS NOT NULL")


def sql_kcore_k2() -> str:
    return (_rec(_CANON, _kcore_rec("kc", "SELECT src, dst FROM canon", 2))
            + _kcore_final("kc"))


def sql_kcore_table(kmin: int = 1, kmax: int = 4) -> str:
    """Chained peels (each K starts from K-1's core — monotone nesting),
    reporting (k, vertices, edges) and stopping after the first empty
    core, exactly like the Spark driver loop."""
    ctes, prev_rel = [], "SELECT src, dst FROM canon"
    finals = {}
    for k in range(kmin, kmax + 1):
        name = f"kc{k}"
        ctes.append(_kcore_rec(name, prev_rel, k))
        finals[k] = f"f{k}"
        ctes.append(f"f{k} AS ({_kcore_final(name)})")
        prev_rel = f"SELECT src, dst FROM f{k}"
    rows = " UNION ALL ".join(
        f"""SELECT {k} AS k,
        (SELECT count(*) FROM (SELECT DISTINCT id FROM
            (SELECT src AS id FROM f{k} UNION ALL SELECT dst FROM f{k})))
            AS vertices,
        (SELECT count(*) FROM f{k}) AS edges"""
        for k in range(kmin, kmax + 1)
    )
    return (_rec(_CANON, *ctes) + f"""
, s AS ({rows})
SELECT CAST(k AS INTEGER) AS k, CAST(vertices AS BIGINT) AS vertices,
       CAST(edges AS BIGINT) AS edges
FROM (SELECT s.*, min(edges) OVER (ORDER BY k
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
      FROM s)
WHERE coalesce(prev_min, 1) > 0""")
