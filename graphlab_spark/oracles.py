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

def _cc_rec(name: str = "cc", verts: str = "verts", sym: str = "sym") -> str:
    """Hash-min label recursion over (verts, sym) — reused by CC, CC
    sizes, and bond percolation (which feeds a filtered edge set)."""
    return f"""
{name}(iter, id, component, nchanged) AS (
  SELECT 0, id, id, CAST(1 AS BIGINT) FROM {verts}
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           least(p.component, coalesce(m.received, p.component)) AS component,
           sum(CASE WHEN coalesce(m.received, p.component) < p.component
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM {name} p
    LEFT JOIN (SELECT s.dst AS mid, min(p2.component) AS received
               FROM {name} p2 JOIN {sym} s ON p2.id = s.src
               GROUP BY s.dst) m ON p.id = m.mid
    WHERE p.nchanged > 0 AND p.iter < 200
  )
)"""


_CC_REC = _cc_rec()


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

def _lpa_rec(max_supersteps: int = 10) -> str:
    """LPA recursion (mirrors algos/label_propagation.py) — reused by
    the labels query and the community-graph contraction oracle."""
    return f"""
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


def sql_lpa(max_supersteps: int = 10) -> str:
    return (_rec(_VERTS, _SYM, _lpa_rec(max_supersteps))
            + "SELECT id, label FROM lpa "
              "WHERE iter = (SELECT max(iter) FROM lpa)")


def sql_contract_by_lpa(max_supersteps: int = 10) -> str:
    """Twin of operators/graph_ops.contract_graph over the LPA
    communities: count original directed edges between distinct final
    labels (every vertex is labeled, so no singleton fallback arm)."""
    return (_rec(_VERTS, _SYM, _lpa_rec(max_supersteps)) + """
, lfin AS (SELECT id, label FROM lpa
           WHERE iter = (SELECT max(iter) FROM lpa))
SELECT a.label AS src, b.label AS dst, CAST(count(*) AS BIGINT) AS w
FROM edges e JOIN lfin a ON e.src = a.id JOIN lfin b ON e.dst = b.id
WHERE a.label <> b.label GROUP BY 1, 2""")


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


def sql_pagerank_delta(tol: float = 1e-6, max_supersteps: int = 200) -> str:
    """Twin of algos/pagerank._pagerank_delta: gather totals cached in
    the level, frontier = |change| > tol, deltas scaled by the edge's
    contribution weight, apply only on vertices receiving a delta."""
    outd = ("outd AS (SELECT src AS id, count(*) AS out_degree "
            "FROM edges GROUP BY 1)")
    cont = ("cont AS (SELECT e.src, e.dst, 1.0 / d.out_degree AS cw "
            "FROM edges e JOIN outd d ON e.src = d.id)")
    rec = f"""
prd(iter, id, rank, total, change, nactive) AS (
  SELECT 0, id, rank, total, change,
         sum(CASE WHEN abs(change) > {tol!r} THEN 1 ELSE 0 END) OVER ()
  FROM (
    SELECT v.id, 0.15 + 0.85 * coalesce(t.t0, 0.0) AS rank,
           coalesce(t.t0, 0.0) AS total,
           0.15 + 0.85 * coalesce(t.t0, 0.0) - 1.0 AS change
    FROM verts v
    LEFT JOIN (SELECT dst, sum(cw) AS t0 FROM cont GROUP BY 1) t
      ON v.id = t.dst
  )
  UNION ALL
  SELECT * FROM (
    SELECT iter, id, rank, total, change,
           sum(CASE WHEN abs(change) > {tol!r} THEN 1 ELSE 0 END)
             OVER () AS nactive
    FROM (
      SELECT p.iter + 1 AS iter, p.id,
             CASE WHEN m.d IS NOT NULL
                  THEN 0.15 + 0.85 * (p.total + m.d)
                  ELSE p.rank END AS rank,
             p.total + coalesce(m.d, 0.0) AS total,
             CASE WHEN m.d IS NOT NULL
                  THEN 0.15 + 0.85 * (p.total + m.d) - p.rank
                  ELSE 0.0 END AS change
      FROM prd p
      LEFT JOIN (SELECT c.dst, sum(p2.change * c.cw) AS d
                 FROM prd p2 JOIN cont c ON p2.id = c.src
                 WHERE abs(p2.change) > {tol!r}
                 GROUP BY c.dst) m ON p.id = m.dst
      WHERE p.nactive > 0 AND p.iter < {max_supersteps}
    )
  )
)"""
    return (_rec(_VERTS, outd, cont, rec)
            + "SELECT id, round(rank, 6) AS rank FROM prd "
              "WHERE iter = (SELECT max(iter) FROM prd)")


# ---------------------------------------------------------------------------
# k-core peeling (mirrors algos/kcore.py)
# ---------------------------------------------------------------------------

from .algos.lbp import PSI as PSI_SQL
from .operators.portable import (sql_edge_hash, sql_lcg_hash, sql_mix31,
                                 sql_unit_interval)

_portable_hash_sql = sql_lcg_hash


# ---------------------------------------------------------------------------
# Shared graphical-models SQL prelude (one source of truth for the six
# engine oracles: lbp/mplp/mplp-table/dd/dd-projected/ad3/bethe)
# ---------------------------------------------------------------------------

def _gm_lphi() -> str:
    """Portable log node potentials ln(phi0)/ln(phi1) over verts."""
    u = sql_lcg_hash("id")
    return (f"lphi AS (SELECT id, "
            f"ln(1.0 - (0.3 + 0.4 * ({u} / 2147483648.0))) AS t0, "
            f"ln(0.3 + 0.4 * ({u} / 2147483648.0)) AS t1 FROM verts)")


_GM_FDEG = ("fdeg AS (SELECT id, count(*) AS dg FROM ("
            "SELECT src AS id FROM canon UNION ALL "
            "SELECT dst FROM canon) GROUP BY id)")

_GM_UN = ("un AS (SELECT p.id, p.t0 / d.dg AS u0, p.t1 / d.dg AS u1 "
          "FROM lphi p JOIN fdeg d ON d.id = p.id)")


def _gm_choice(lu0: str, lu1: str, lv0: str, lv1: str) -> tuple:
    """The DD slaves' lexicographic argmax over the 4 binary combos
    (mirrors algos/dd._slave_choice)."""
    import math as _math
    lth = [[repr(_math.log(q)) for q in row] for row in PSI_SQL]
    s00 = f"(au0 + {lu0} + bv0 + {lv0} + {lth[0][0]})"
    s01 = f"(au0 + {lu0} + bv1 + {lv1} + {lth[0][1]})"
    s10 = f"(au1 + {lu1} + bv0 + {lv0} + {lth[1][0]})"
    s11 = f"(au1 + {lu1} + bv1 + {lv1} + {lth[1][1]})"
    m = f"greatest({s00}, {s01}, {s10}, {s11})"
    xi = (f"CASE WHEN {s00} = {m} THEN 0 WHEN {s01} = {m} THEN 0 "
          f"WHEN {s10} = {m} THEN 1 ELSE 1 END")
    xj = (f"CASE WHEN {s00} = {m} THEN 0 WHEN {s01} = {m} THEN 1 "
          f"WHEN {s10} = {m} THEN 0 ELSE 1 END")
    return xi, xj


# ---------------------------------------------------------------------------
# greedy coloring (mirrors algos/coloring.py Jones-Plassmann rounds)
# ---------------------------------------------------------------------------

def sql_coloring(max_rounds: int = 200) -> str:
    symd = ("symd AS (SELECT DISTINCT src, dst FROM "
            "(SELECT src, dst FROM edges "
            "UNION ALL SELECT dst AS src, src AS dst FROM edges))")
    rec = f"""
colr(iter, id, deg, h, color, npend) AS (
  SELECT 0, v.id, coalesce(d.deg, 0), {_portable_hash_sql('v.id')},
         CAST(NULL AS INTEGER), count(*) OVER ()
  FROM verts v
  LEFT JOIN (SELECT src AS id, count(*) AS deg FROM symd GROUP BY 1) d
    ON v.id = d.id
  UNION ALL
  SELECT * FROM (
    SELECT iter, id, deg, h, color,
           sum(CASE WHEN color IS NULL THEN 1 ELSE 0 END) OVER () AS npend
    FROM (
      SELECT p.iter + 1 AS iter, p.id, p.deg, p.h,
             CASE WHEN p.color IS NOT NULL THEN p.color
                  WHEN l.id IS NOT NULL THEN CAST(NULL AS INTEGER)
                  ELSE CAST(coalesce(fc.c, 0) AS INTEGER) END AS color
      FROM colr p
      LEFT JOIN (SELECT DISTINCT s.src AS id
                 FROM symd s
                 JOIN colr q ON s.dst = q.id AND q.color IS NULL
                 JOIN colr r ON s.src = r.id AND r.color IS NULL
                 WHERE (q.deg, q.h, q.id) > (r.deg, r.h, r.id)) l
        ON p.id = l.id
      LEFT JOIN (SELECT id, list_filter(generate_series(0, len(ul)),
                        k -> NOT list_contains(ul, k))[1] AS c
                 FROM (SELECT s.src AS id, list(DISTINCT cc.color) AS ul
                       FROM symd s JOIN colr cc
                         ON s.dst = cc.id AND cc.color IS NOT NULL
                       GROUP BY s.src)) fc
        ON p.id = fc.id
      WHERE p.npend > 0 AND p.iter < {max_rounds}
    )
  )
)"""
    return (_rec(_VERTS, symd, rec)
            + "SELECT id, color FROM colr "
              "WHERE iter = (SELECT max(iter) FROM colr)")


# ---------------------------------------------------------------------------
# approximate diameter (mirrors algos/diameter.py FM supersteps)
# ---------------------------------------------------------------------------

_FM_M = 2_147_483_648
_FM_STRIDE = 1_000_003  # algos.diameter._REPLICA_STRIDE


def _fm_ladder_sql(k: str) -> str:
    """SQL twin of algos.diameter._fm_bit's threshold ladder over an
    already-mixed 31-bit value ``k`` (pass a plain column reference —
    the ladder repeats it 31x)."""
    cases = " ".join(
        f"WHEN {k} < {_FM_M - (_FM_M >> (j + 1))} THEN CAST({1 << j} AS BIGINT)"
        for j in range(31)
    )
    return f"(CASE {cases} ELSE CAST({1 << 31} AS BIGINT) END)"


def sql_approx_diameter(n_masks: int = 8, max_supersteps: int = 64,
                        direction: str = "out") -> str:
    cols = [f"bm{i}" for i in range(n_masks)]
    contrib = " + ".join(
        f"CAST((~{c}) & -(~{c}) AS DOUBLE)" for c in cols)
    est = f"({contrib}) / {n_masks * 0.77351!r}"
    seeds = ", ".join(
        sql_mix31(f"(((id % {_FM_M} + {_FM_M}) % {_FM_M}"
                  f" + {i} * {_FM_STRIDE}) % {_FM_M})") + f" AS k{i}"
        for i in range(n_masks))
    init_masks = ", ".join(
        f"{_fm_ladder_sql(f'k{i}')} AS bm{i}" for i in range(n_masks))
    or_masks = ", ".join(
        f"p.bm{i} | coalesce(n.o{i}, 0) AS bm{i}" for i in range(n_masks))
    or_aggs = ", ".join(f"bit_or(p2.bm{i}) AS o{i}" for i in range(n_masks))
    collist = ", ".join(cols)
    rec = f"""
fm(iter, id, {collist}, est, prev_est) AS (
  SELECT iter, id, {collist}, sum({est}) OVER () AS est,
         CAST(0.0 AS DOUBLE) AS prev_est
  FROM (SELECT 0 AS iter, id, {init_masks}
        FROM (SELECT id, {seeds} FROM verts))
  UNION ALL
  SELECT * FROM (
    SELECT iter, id, {collist}, sum({est}) OVER () AS est, prev_est
    FROM (
      SELECT p.iter + 1 AS iter, p.id, {or_masks}, p.est AS prev_est
      FROM fm p
      LEFT JOIN (SELECT e.dst, {or_aggs}
                 FROM fm p2 JOIN {'sym' if direction == 'all' else 'edges'} e
                   ON p2.id = e.src
                 GROUP BY e.dst) n ON p.id = n.dst
      WHERE p.est > p.prev_est * 1.0001 AND p.iter < {max_supersteps}
    )
  )
)"""
    ctes = (_VERTS, _SYM, rec) if direction == "all" else (_VERTS, rec)
    return (_rec(*ctes)
            + "SELECT CAST(max(iter) AS INTEGER) AS diameter FROM fm")


# ---------------------------------------------------------------------------
# Lloyd's k-means, full iterative run (mirrors algos/kmeans.py init='first')
# ---------------------------------------------------------------------------

def sql_kmeans_full(k: int = 4, iterations: int = 10,
                    table: str = "embeddings") -> str:
    dist = ("list_sum(list_transform(generate_series(1, len(p.v)),"
            " i -> (p.v[i] - c2.center[i]) * (p.v[i] - c2.center[i])))")
    return f"""
WITH RECURSIVE
pts AS (SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM {table}),
cen(iter, cluster, center) AS (
  SELECT 0, CAST(row_number() OVER (ORDER BY id) - 1 AS INT), v
  FROM (SELECT id, v FROM pts ORDER BY id LIMIT {k})
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, c.cluster,
           coalesce(nc.center, c.center) AS center
    FROM (SELECT DISTINCT iter FROM cen) m
    JOIN cen c ON TRUE
    LEFT JOIN (
      SELECT cluster, list(m ORDER BY pos) AS center
      FROM (
        SELECT a.cluster, g.pos, avg(p.v[g.pos]) AS m
        FROM (SELECT id, cluster FROM (
                SELECT p.id, c2.cluster,
                       row_number() OVER (PARTITION BY p.id
                           ORDER BY {dist}, c2.cluster) AS rn
                FROM pts p CROSS JOIN cen c2
              ) WHERE rn = 1) a
        JOIN pts p ON a.id = p.id
        CROSS JOIN (SELECT unnest(generate_series(1,
                        (SELECT len(v) FROM pts LIMIT 1))) AS pos) g
        GROUP BY a.cluster, g.pos
      ) GROUP BY cluster
    ) nc ON c.cluster = nc.cluster
    WHERE m.iter < {iterations - 1}
  )
)
SELECT id, cluster FROM (
  SELECT p.id, c2.cluster,
         row_number() OVER (PARTITION BY p.id ORDER BY {dist}, c2.cluster) AS rn
  FROM pts p CROSS JOIN (SELECT * FROM cen
                         WHERE iter = (SELECT max(iter) FROM cen)) c2
) WHERE rn = 1"""


# ---------------------------------------------------------------------------
# SIR cascade + bond percolation (mirrors algos/cascades.py)
# ---------------------------------------------------------------------------

def sql_sir_cascade(source: int = -1, p_percent: int = 30) -> str:
    tedges = (f"tedges AS (SELECT src, dst FROM sym "
              f"WHERE {sql_edge_hash('src', 'dst')} % 100 < {p_percent})")
    rec = f"""
sir(iter, id, step, nchanged) AS (
  SELECT 0, id, 0, CAST(1 AS BIGINT) FROM verts WHERE id = {source}
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, n.id, n.step,
           sum(CASE WHEN q.id IS NULL OR n.step < q.step
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM (SELECT id, min(step) AS step FROM (
            SELECT id, step FROM sir
            UNION ALL
            SELECT t.dst AS id, p.step + 1 AS step
            FROM sir p JOIN tedges t ON p.id = t.src
          ) GROUP BY id) n
    LEFT JOIN sir q ON n.id = q.id
    CROSS JOIN (SELECT DISTINCT iter, nchanged FROM sir) m
    WHERE m.nchanged > 0 AND m.iter < 200
  )
)"""
    return (_rec(_VERTS, _SYM, tedges, rec)
            + "SELECT id, CAST(step AS INTEGER) AS step FROM sir "
              "WHERE iter = (SELECT max(iter) FROM sir)")


def sql_bond_percolation(p_percent: int = 50) -> str:
    kept = (f"kept AS (SELECT src, dst FROM canon "
            f"WHERE {sql_edge_hash('src', 'dst')} % 100 < {p_percent})")
    ksym = ("ksym AS (SELECT src, dst FROM kept "
            "UNION ALL SELECT dst AS src, src AS dst FROM kept)")
    kverts = ("kverts AS (SELECT DISTINCT id FROM (SELECT src AS id FROM "
              "kept UNION ALL SELECT dst FROM kept))")
    return (_rec(_VERTS, _CANON, kept, ksym, kverts,
                 _cc_rec("pcc", "kverts", "ksym")) + """
SELECT id, component FROM pcc WHERE iter = (SELECT max(iter) FROM pcc)
UNION ALL
SELECT v.id, v.id AS component FROM verts v
WHERE v.id NOT IN (SELECT id FROM kverts)""")


# ---------------------------------------------------------------------------
# topological layers (mirrors operators/graph_ops.topological_layers)
# ---------------------------------------------------------------------------

def sql_topo_layers(max_turns: int = 12) -> str:
    """Longest-path-from-source layers over the events DAG truncated to
    the first ``max_turns`` events per user (the same truncation the
    Spark contract query applies, replayed via row_number)."""
    limited = EDGES_CTES.replace("FROM events", "FROM ev_lim")
    ev_lim = f"""
ev_lim AS (SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS rn
    FROM events) WHERE rn <= {max_turns})"""
    rec = """
topo(iter, id, layer, nchanged) AS (
  SELECT 0, id, 0, CAST(1 AS BIGINT) FROM verts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           CASE WHEN coalesce(m.cand, -1) > p.layer THEN m.cand
                ELSE p.layer END AS layer,
           sum(CASE WHEN coalesce(m.cand, -1) > p.layer
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM topo p
    LEFT JOIN (SELECT e.dst, max(p2.layer) + 1 AS cand
               FROM topo p2 JOIN edges e ON p2.id = e.src
               GROUP BY e.dst) m ON p.id = m.dst
    WHERE p.nchanged > 0 AND p.iter < 500
  )
)"""
    return ("WITH RECURSIVE " + ",\n".join(
        [ev_lim.strip(), limited.strip(), _VERTS, rec.strip()])
        + "\nSELECT id, CAST(layer AS INTEGER) AS layer FROM topo "
          "WHERE iter = (SELECT max(iter) FROM topo)")


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


# ---------------------------------------------------------------------------
# CF family: full-batch SGD + SVD power iteration (mirrors algos/sgd.py,
# algos/svd.py) over the lineitem-derived ratings (supplier x part,
# rating = min quantity — min, not avg, so both engines agree bit-for-bit)
# ---------------------------------------------------------------------------

RATINGS_CTE = (
    "ratings AS (SELECT l_suppkey AS u, l_partkey AS it, "
    "CAST(min(l_quantity) AS DOUBLE) / 50.0 AS r FROM lineitem GROUP BY 1, 2)")


def _init_v_sql(side_expr: str) -> str:
    seed = f"(b.id * 31 + fs.f * 7 + {side_expr} * 13)"
    return f"0.1 * ({sql_lcg_hash(seed)} / 2147483648.0)"


def sql_sgd_user_factors(k: int = 4, iterations: int = 3,
                         lr: float = 0.01, reg: float = 0.05) -> str:
    err_sub = """
        (SELECT r.u, r.it, r.r - sum(pu.v * qi.v) AS e
         FROM ratings r
         JOIN fac pu ON pu.side = 0 AND pu.id = r.u
         JOIN fac qi ON qi.side = 1 AND qi.id = r.it AND qi.f = pu.f
         GROUP BY r.u, r.it, r.r)"""
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
fs AS (SELECT CAST(unnest(generate_series(0, {k - 1})) AS INTEGER) AS f),
sides AS (SELECT 0 AS side, u AS id FROM (SELECT DISTINCT u FROM ratings)
          UNION ALL
          SELECT 1, it FROM (SELECT DISTINCT it FROM ratings)),
fac(iter, side, id, f, v) AS (
  SELECT 0, b.side, b.id, fs.f, {_init_v_sql('b.side')}
  FROM sides b CROSS JOIN fs
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.side, p.id, p.f,
           p.v + {lr!r} * (coalesce(g.g, 0.0) - {reg!r} * p.v) AS v
    FROM fac p
    LEFT JOIN (
      SELECT 0 AS side, e.u AS id, q.f, sum(e.e * q.v) AS g
      FROM {err_sub} e JOIN fac q ON q.side = 1 AND q.id = e.it
      GROUP BY e.u, q.f
      UNION ALL
      SELECT 1, e.it, q.f, sum(e.e * q.v)
      FROM {err_sub} e JOIN fac q ON q.side = 0 AND q.id = e.u
      GROUP BY e.it, q.f
    ) g ON p.side = g.side AND p.id = g.id AND p.f = g.f
    WHERE p.iter < {iterations}
  )
)
SELECT id, f, round(v, 6) AS v FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


def sql_sgd_rmse(k: int = 4, iterations: int = 3,
                 lr: float = 0.01, reg: float = 0.05) -> str:
    base = sql_sgd_user_factors(k, iterations, lr, reg)
    head = base[: base.rindex("SELECT id, f,")]
    return head + f"""
, final AS (SELECT side, id, f, v FROM fac
            WHERE iter = (SELECT max(iter) FROM fac)),
pred AS (SELECT r.u, r.it, r.r, sum(pu.v * qi.v) AS p
         FROM ratings r
         JOIN final pu ON pu.side = 0 AND pu.id = r.u
         JOIN final qi ON qi.side = 1 AND qi.id = r.it AND qi.f = pu.f
         GROUP BY r.u, r.it, r.r)
SELECT round(sqrt(avg((r - p) * (r - p))), 6) AS rmse FROM pred"""


def sql_svd_power(iterations: int = 8) -> str:
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
iids AS (SELECT DISTINCT it AS id FROM ratings),
pv(iter, id, xv) AS (
  SELECT 0, id, CAST(1.0 AS DOUBLE) FROM iids
  UNION ALL
  SELECT * FROM (
    SELECT iter, id, zv / nrm AS xv FROM (
      SELECT p.iter + 1 AS iter, z.id, z.zv,
             sqrt(sum(z.zv * z.zv) OVER ()) AS nrm
      FROM (
        SELECT r2.it AS id, sum(r2.r * y.yv) AS zv
        FROM (SELECT r.u, sum(r.r * p2.xv) AS yv
              FROM ratings r JOIN pv p2 ON p2.id = r.it
              GROUP BY r.u) y
        JOIN ratings r2 ON r2.u = y.u
        GROUP BY r2.it
      ) z
      CROSS JOIN (SELECT DISTINCT iter FROM pv) p
      WHERE p.iter < {iterations}
    )
  )
)
SELECT id, round(xv, 6) AS xv FROM pv
WHERE iter = (SELECT max(iter) FROM pv)"""


# ---------------------------------------------------------------------------
# spectral pipeline (mirrors algos/spectral.py)
# ---------------------------------------------------------------------------

_UND = ("und AS (SELECT DISTINCT src, dst FROM sym)")
_UDEG = ("udeg AS (SELECT src AS id, count(*) AS deg FROM und GROUP BY 1)")


def sql_laplacian() -> str:
    return (_rec(_SYM, _UND, _UDEG) + """
SELECT u.src, u.dst,
       round(1.0 / sqrt(d1.deg * d2.deg), 6) AS w
FROM und u JOIN udeg d1 ON u.src = d1.id JOIN udeg d2 ON u.dst = d2.id""")


def _spectral_rec(iterations: int) -> str:
    x0 = sql_lcg_hash("id")
    return f"""
v1 AS (SELECT id, sqrt(deg) / sqrt((SELECT sum(deg) FROM udeg)) AS v1
       FROM udeg),
nadj AS (SELECT u.src, u.dst, 1.0 / sqrt(d1.deg * d2.deg) AS w
         FROM und u JOIN udeg d1 ON u.src = d1.id
         JOIN udeg d2 ON u.dst = d2.id),
se(iter, id, xv) AS (
  SELECT 0, id, ({x0} / 2147483648.0) - 0.5 FROM udeg
  UNION ALL
  SELECT * FROM (
    SELECT iter, id,
           (yv - s1 * v1v) / sqrt(greatest(sy2 - s1 * s1, 1e-300)) AS xv
    FROM (
      SELECT p.iter + 1 AS iter, v.id, v.v1 AS v1v,
             coalesce(y.yv, 0.0) AS yv,
             sum(v.v1 * coalesce(y.yv, 0.0)) OVER () AS s1,
             sum(coalesce(y.yv, 0.0) * coalesce(y.yv, 0.0)) OVER () AS sy2
      FROM v1 v
      LEFT JOIN (SELECT n.dst AS id, sum(n.w * p2.xv) AS yv
                 FROM se p2 JOIN nadj n ON p2.id = n.src
                 GROUP BY n.dst) y ON v.id = y.id
      CROSS JOIN (SELECT DISTINCT iter FROM se) p
      WHERE p.iter < {iterations}
    )
  )
)"""


def sql_spectral_embedding(iterations: int = 15) -> str:
    return (_rec(_SYM, _UND, _UDEG, _spectral_rec(iterations))
            + "SELECT id, round(xv, 6) AS comp FROM se "
              "WHERE iter = (SELECT max(iter) FROM se)")


def sql_spectral_clusters(k: int = 2, iterations: int = 15,
                          lloyd_iterations: int = 20) -> str:
    """spectral_clusters = the embedding recursion above feeding a 1-D
    Lloyd's k-means recursion (mirrors algos/spectral.py:96 →
    algos/kmeans.py init='first').  The Spark loop stops early when the
    centers repeat; Lloyd's updates are idempotent at that fixpoint, so
    a fixed ``lloyd_iterations - 1``-update unroll lands on the same
    assignment."""
    d = "(p.v - c2.center) * (p.v - c2.center)"
    # MATERIALIZED: without it DuckDB inlines the embedding recursion
    # into every Lloyd level and re-runs it lloyd_iterations times.
    pts = ("pts AS MATERIALIZED (SELECT id, xv AS v FROM se "
           "WHERE iter = (SELECT max(iter) FROM se))")
    cen = f"""
cen(iter, cluster, center) AS (
  SELECT 0, CAST(row_number() OVER (ORDER BY id) - 1 AS INT), v
  FROM (SELECT id, v FROM pts ORDER BY id LIMIT {k})
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, c.cluster,
           coalesce(nc.center, c.center) AS center
    FROM (SELECT DISTINCT iter FROM cen) m
    JOIN cen c ON TRUE
    LEFT JOIN (
      SELECT cluster, avg(v) AS center
      FROM (
        SELECT p.id, p.v, c2.cluster,
               row_number() OVER (PARTITION BY p.id
                   ORDER BY {d}, c2.cluster) AS rn
        FROM pts p CROSS JOIN cen c2
      ) WHERE rn = 1
      GROUP BY cluster
    ) nc ON c.cluster = nc.cluster
    WHERE m.iter < {lloyd_iterations - 1}
  )
)"""
    return (_rec(_SYM, _UND, _UDEG, _spectral_rec(iterations), pts, cen)
            + f"""
SELECT id, cluster FROM (
  SELECT p.id, c2.cluster,
         row_number() OVER (PARTITION BY p.id ORDER BY {d}, c2.cluster) AS rn
  FROM pts p CROSS JOIN (SELECT * FROM cen
                         WHERE iter = (SELECT max(iter) FROM cen)) c2
) WHERE rn = 1""")


# ---------------------------------------------------------------------------
# LDA / CVB0 (mirrors algos/lda.py)
# ---------------------------------------------------------------------------

def sql_lda_word_topics(k: int = 4, iterations: int = 2,
                        alpha: float = 0.5, beta: float = 0.1) -> str:
    seed = "(p0.doc_id * 1009 + p0.wid * 101 + ks.k)"
    return f"""
WITH RECURSIVE
toks AS (SELECT doc_id,
                unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                AS word
         FROM documents),
cnts AS (SELECT doc_id, word, count(*) AS cnt FROM toks
         WHERE len(word) > 0 GROUP BY 1, 2),
dim AS (SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT)
               AS wid
        FROM (SELECT DISTINCT word FROM cnts)),
dw AS (SELECT c.doc_id, d.wid, c.word, c.cnt
       FROM cnts c JOIN dim d USING (word)),
ks AS (SELECT CAST(unnest(generate_series(0, {k - 1})) AS INTEGER) AS k),
gam(iter, doc_id, wid, word, cnt, k, g) AS (
  SELECT 0, doc_id, wid, word, cnt, k,
         raw / sum(raw) OVER (PARTITION BY doc_id, wid)
  FROM (SELECT p0.*, ks.k,
               1.0 + ({sql_lcg_hash(seed)} / 2147483648.0) AS raw
        FROM dw p0 CROSS JOIN ks)
  UNION ALL
  SELECT * FROM (
    SELECT iter, doc_id, wid, word, cnt, k,
           raw / sum(raw) OVER (PARTITION BY doc_id, wid) AS g
    FROM (
      SELECT p.iter + 1 AS iter, p.doc_id, p.wid, p.word, p.cnt, p.k,
             (nwk.nwk - p.g + {beta!r}) * (ndk.ndk - p.g + {alpha!r})
             / (nk.nk - p.g + (SELECT count(*) FROM dim) * {beta!r}) AS raw
      FROM gam p
      JOIN (SELECT wid, k, sum(cnt * g) AS nwk FROM gam GROUP BY 1, 2) nwk
        ON p.wid = nwk.wid AND p.k = nwk.k
      JOIN (SELECT doc_id, k, sum(cnt * g) AS ndk FROM gam GROUP BY 1, 2) ndk
        ON p.doc_id = ndk.doc_id AND p.k = ndk.k
      JOIN (SELECT k, sum(cnt * g) AS nk FROM gam GROUP BY 1) nk
        ON p.k = nk.k
      WHERE p.iter < {iterations}
    )
  )
)
SELECT word, k, round(sum(cnt * g), 6) AS weight
FROM gam WHERE iter = (SELECT max(iter) FROM gam)
GROUP BY word, k"""


# ---------------------------------------------------------------------------
# loopy belief propagation (mirrors algos/lbp.py; K=2, Potts psi)
# ---------------------------------------------------------------------------

def sql_lbp_beliefs(iterations: int = 5) -> str:
    u = sql_lcg_hash("id")
    phi = (f"phi AS (SELECT id, 1.0 - (0.3 + 0.4 * ({u} / 2147483648.0)) "
           f"AS phi0, 0.3 + 0.4 * ({u} / 2147483648.0) AS phi1 FROM verts)")
    symd = "symd AS (SELECT DISTINCT src, dst FROM sym)"
    rec = f"""
bp(iter, src, dst, lm0, lm1) AS (
  SELECT 0, src, dst, ln(0.5), ln(0.5) FROM symd
  UNION ALL
  SELECT * FROM (
    SELECT iter, src, dst,
           ln(m0 / (m0 + m1)) AS lm0, ln(m1 / (m0 + m1)) AS lm1
    FROM (
      SELECT iter, src, dst,
             s0 * {PSI_SQL[0][0]} + s1 * {PSI_SQL[1][0]} AS m0,
             s0 * {PSI_SQL[0][1]} + s1 * {PSI_SQL[1][1]} AS m1
      FROM (
        SELECT iter, src, dst,
               phi0 * exp(lc0 - greatest(lc0, lc1)) AS s0,
               phi1 * exp(lc1 - greatest(lc0, lc1)) AS s1
        FROM (
          SELECT it.iter + 1 AS iter, e.src, e.dst, f.phi0, f.phi1,
                 lp.lp0 - r.rl0 AS lc0, lp.lp1 - r.rl1 AS lc1
          FROM symd e
          JOIN (SELECT dst AS id, sum(lm0) AS lp0, sum(lm1) AS lp1
                FROM bp GROUP BY 1) lp ON e.src = lp.id
          JOIN (SELECT dst AS src, src AS dst, lm0 AS rl0, lm1 AS rl1
                FROM bp) r ON e.src = r.src AND e.dst = r.dst
          JOIN phi f ON e.src = f.id
          CROSS JOIN (SELECT DISTINCT iter FROM bp) it
          WHERE it.iter < {iterations}
        )
      )
    )
  )
)"""
    return (_rec(_VERTS, _SYM, symd, phi, rec) + """
, lpf AS (SELECT dst AS id, sum(lm0) AS lp0, sum(lm1) AS lp1
          FROM bp WHERE iter = (SELECT max(iter) FROM bp) GROUP BY 1)
SELECT f.id,
       round(f.phi1 * exp(lp1 - greatest(lp0, lp1))
             / (f.phi0 * exp(lp0 - greatest(lp0, lp1))
                + f.phi1 * exp(lp1 - greatest(lp0, lp1))), 6) AS b1
FROM phi f JOIN lpf USING (id)""")


# ---------------------------------------------------------------------------
# NMF (mirrors algos/nmf.py: masked alternating Lee-Seung updates)
# ---------------------------------------------------------------------------

def _nmf_init_sql(side: int) -> str:
    seed = f"(b.id * 31 + fs.f * 7 + {side * 13})"
    return f"0.1 + 0.4 * ({sql_lcg_hash(seed)} / 2147483648.0)"


def _nmf_half_sweep_sql(this_rel: str, other_rel: str, this_key: str,
                        other_key: str, eps: float) -> str:
    """SQL for one multiplicative half-sweep of ``this_rel`` against
    ``other_rel`` (both (id, f, v) relations); mirrors _half_sweep."""
    pred = f"""(SELECT r.{this_key} AS tk, r.{other_key} AS ok,
       sum(t.v * o.v) AS p
FROM ratings r
JOIN {this_rel} t ON t.id = r.{this_key}
JOIN {other_rel} o ON o.id = r.{other_key} AND o.f = t.f
GROUP BY r.{this_key}, r.{other_key})"""
    return f"""(SELECT t.id, t.f, t.v * num.s / (den.s + {eps!r}) AS v
FROM {this_rel} t
JOIN (SELECT r.{this_key} AS id, o.f, sum(r.r * o.v) AS s
      FROM ratings r JOIN {other_rel} o ON o.id = r.{other_key}
      GROUP BY r.{this_key}, o.f) num ON t.id = num.id AND t.f = num.f
JOIN (SELECT p.tk AS id, o.f, sum(p.p * o.v) AS s
      FROM {pred} p JOIN {other_rel} o ON o.id = p.ok
      GROUP BY p.tk, o.f) den ON t.id = den.id AND t.f = den.f)"""


def sql_nmf_user_factors(k: int = 4, iterations: int = 3,
                         eps: float = 1e-9) -> str:
    w_prev = "(SELECT id, f, v FROM fac WHERE side = 0)"
    h_prev = "(SELECT id, f, v FROM fac WHERE side = 1)"
    w_new = _nmf_half_sweep_sql(w_prev, h_prev, "u", "it", eps)
    h_new = _nmf_half_sweep_sql(h_prev, w_new, "it", "u", eps)
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
fs AS (SELECT CAST(unnest(generate_series(0, {k - 1})) AS INTEGER) AS f),
fac(iter, side, id, f, v) AS (
  SELECT 0, b.side, b.id, fs.f,
         CASE WHEN b.side = 0 THEN {_nmf_init_sql(0)}
              ELSE {_nmf_init_sql(1)} END
  FROM (SELECT 0 AS side, u AS id FROM (SELECT DISTINCT u FROM ratings)
        UNION ALL
        SELECT 1, it FROM (SELECT DISTINCT it FROM ratings)) b
  CROSS JOIN fs
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, 0 AS side, wn.id, wn.f, wn.v
    FROM {w_new} wn
    CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
    UNION ALL
    SELECT m.iter + 1, 1, hn.id, hn.f, hn.v
    FROM {h_new} hn
    CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
  )
)
SELECT id, f, round(v, 6) AS v FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


# ---------------------------------------------------------------------------
# bias-SGD (mirrors algos/biassgd.py: mu + b_u + b_i + p.q, full-batch)
# ---------------------------------------------------------------------------

def _biassgd_head(k: int, iterations: int, lr: float, reg: float) -> str:
    """Shared WITH RECURSIVE prelude ending at the closed ``fac`` CTE.

    Parameter table layout matches the Spark side: ``f in 0..k-1`` are
    factors, ``f = -1`` is the bias (init 0.0); the update rule
    ``v += lr*(g - reg*v)`` is shared, only the gradient differs.
    """
    err = f"""(SELECT r.u, r.it,
           r.r - (SELECT m FROM mu)
               - sum(CASE WHEN pu.f >= 0 THEN pu.v * qi.v
                          ELSE pu.v + qi.v END) AS e
    FROM ratings r
    JOIN fac pu ON pu.side = 0 AND pu.id = r.u
    JOIN fac qi ON qi.side = 1 AND qi.id = r.it AND qi.f = pu.f
    GROUP BY r.u, r.it, r.r)"""
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
mu AS (SELECT avg(r) AS m FROM ratings),
fsb AS (SELECT CAST(unnest(generate_series(-1, {k - 1})) AS INTEGER) AS f),
sides AS (SELECT 0 AS side, u AS id FROM (SELECT DISTINCT u FROM ratings)
          UNION ALL
          SELECT 1, it FROM (SELECT DISTINCT it FROM ratings)),
fac(iter, side, id, f, v) AS (
  SELECT 0, b.side, b.id, fs.f,
         CASE WHEN fs.f = -1 THEN 0.0 ELSE {_init_v_sql('b.side')} END
  FROM sides b CROSS JOIN fsb fs
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.side, p.id, p.f,
           p.v + {lr!r} * (coalesce(g.g, 0.0) - {reg!r} * p.v) AS v
    FROM fac p
    LEFT JOIN (
      SELECT 0 AS side, e.u AS id, q.f, sum(e.e * q.v) AS g
      FROM {err} e JOIN fac q ON q.side = 1 AND q.id = e.it AND q.f >= 0
      GROUP BY e.u, q.f
      UNION ALL
      SELECT 1, e.it, q.f, sum(e.e * q.v)
      FROM {err} e JOIN fac q ON q.side = 0 AND q.id = e.u AND q.f >= 0
      GROUP BY e.it, q.f
      UNION ALL
      SELECT 0, e.u, -1, sum(e.e) FROM {err} e GROUP BY e.u
      UNION ALL
      SELECT 1, e.it, -1, sum(e.e) FROM {err} e GROUP BY e.it
    ) g ON p.side = g.side AND p.id = g.id AND p.f = g.f
    WHERE p.iter < {iterations}
  )
)"""


def sql_biassgd_user_params(k: int = 4, iterations: int = 3,
                            lr: float = 0.01, reg: float = 0.05) -> str:
    return _biassgd_head(k, iterations, lr, reg) + """
SELECT id, f, round(v, 6) AS v FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


def sql_biassgd_rmse(k: int = 4, iterations: int = 3,
                     lr: float = 0.01, reg: float = 0.05) -> str:
    return _biassgd_head(k, iterations, lr, reg) + """
, final AS (SELECT side, id, f, v FROM fac
            WHERE iter = (SELECT max(iter) FROM fac)),
pred AS (SELECT r.u, r.it, r.r,
                (SELECT m FROM mu)
                + sum(CASE WHEN pu.f >= 0 THEN pu.v * qi.v
                           ELSE pu.v + qi.v END) AS p
         FROM ratings r
         JOIN final pu ON pu.side = 0 AND pu.id = r.u
         JOIN final qi ON qi.side = 1 AND qi.id = r.it AND qi.f = pu.f
         GROUP BY r.u, r.it, r.r)
SELECT round(sqrt(avg((r - p) * (r - p))), 6) AS rmse FROM pred"""


# ---------------------------------------------------------------------------
# SVD++ (mirrors algos/svdpp.py: mu + biases + q.(p + implicit), full-batch)
# ---------------------------------------------------------------------------

def _svdpp_head(k: int, iterations: int, lr: float, reg: float) -> str:
    """Shared WITH RECURSIVE prelude ending at the closed ``fac`` CTE.

    Sides: 0 = user p (+bias f=-1), 1 = item q (+bias f=-1),
    2 = item y (implicit, factors only); update rule shared.
    """
    wu = """(SELECT r.u, y.f, sum(y.v) / sqrt(n.c) AS w
     FROM ratings r JOIN fac y ON y.side = 2 AND y.id = r.it
     JOIN nu n ON n.u = r.u GROUP BY r.u, y.f, n.c)"""
    err = f"""(SELECT r.u, r.it,
           r.r - (SELECT m FROM mu)
               - sum(CASE WHEN pu.f >= 0 THEN qi.v * (pu.v + w.w)
                          ELSE pu.v + qi.v END) AS e
    FROM ratings r
    JOIN fac pu ON pu.side = 0 AND pu.id = r.u
    JOIN fac qi ON qi.side = 1 AND qi.id = r.it AND qi.f = pu.f
    LEFT JOIN {wu} w ON w.u = r.u AND w.f = pu.f
    GROUP BY r.u, r.it, r.r)"""
    t = f"""(SELECT e.u, q.f, sum(e.e * q.v) AS t
    FROM {err} e JOIN fac q ON q.side = 1 AND q.id = e.it AND q.f >= 0
    GROUP BY e.u, q.f)"""
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
mu AS (SELECT avg(r) AS m FROM ratings),
nu AS (SELECT u, count(*) AS c FROM ratings GROUP BY u),
fsb AS (SELECT CAST(unnest(generate_series(-1, {k - 1})) AS INTEGER) AS f),
sides AS (SELECT 0 AS side, u AS id FROM (SELECT DISTINCT u FROM ratings)
          UNION ALL
          SELECT 1, it FROM (SELECT DISTINCT it FROM ratings)
          UNION ALL
          SELECT 2, it FROM (SELECT DISTINCT it FROM ratings)),
fac(iter, side, id, f, v) AS (
  SELECT 0, b.side, b.id, fs.f,
         CASE WHEN fs.f = -1 THEN 0.0 ELSE {_init_v_sql('b.side')} END
  FROM sides b JOIN fsb fs ON fs.f >= 0 OR b.side < 2
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.side, p.id, p.f,
           p.v + {lr!r} * (coalesce(g.g, 0.0) - {reg!r} * p.v) AS v
    FROM fac p
    LEFT JOIN (
      SELECT 0 AS side, t.u AS id, t.f, t.t AS g FROM {t} t
      UNION ALL
      SELECT 1, e.it, q.f, sum(e.e * (q.v + coalesce(w.w, 0.0)))
      FROM {err} e
      JOIN fac q ON q.side = 0 AND q.id = e.u AND q.f >= 0
      LEFT JOIN {wu} w ON w.u = e.u AND w.f = q.f
      GROUP BY e.it, q.f
      UNION ALL
      SELECT 2, r.it, t.f, sum(t.t / sqrt(n.c))
      FROM ratings r JOIN {t} t ON t.u = r.u JOIN nu n ON n.u = r.u
      GROUP BY r.it, t.f
      UNION ALL
      SELECT 0, e.u, -1, sum(e.e) FROM {err} e GROUP BY e.u
      UNION ALL
      SELECT 1, e.it, -1, sum(e.e) FROM {err} e GROUP BY e.it
    ) g ON p.side = g.side AND p.id = g.id AND p.f = g.f
    WHERE p.iter < {iterations}
  )
)"""


def sql_svdpp_user_params(k: int = 4, iterations: int = 3,
                          lr: float = 0.01, reg: float = 0.05) -> str:
    return _svdpp_head(k, iterations, lr, reg) + """
SELECT id, f, round(v, 6) AS v FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


def sql_svdpp_rmse(k: int = 4, iterations: int = 3,
                   lr: float = 0.01, reg: float = 0.05) -> str:
    return _svdpp_head(k, iterations, lr, reg) + """
, final AS (SELECT side, id, f, v FROM fac
            WHERE iter = (SELECT max(iter) FROM fac)),
fwu AS (SELECT r.u, y.f, sum(y.v) / sqrt(n.c) AS w
        FROM ratings r JOIN final y ON y.side = 2 AND y.id = r.it
        JOIN nu n ON n.u = r.u GROUP BY r.u, y.f, n.c),
pred AS (SELECT r.u, r.it, r.r,
                (SELECT m FROM mu)
                + sum(CASE WHEN pu.f >= 0 THEN qi.v * (pu.v + w.w)
                           ELSE pu.v + qi.v END) AS p
         FROM ratings r
         JOIN final pu ON pu.side = 0 AND pu.id = r.u
         JOIN final qi ON qi.side = 1 AND qi.id = r.it AND qi.f = pu.f
         LEFT JOIN fwu w ON w.u = r.u AND w.f = pu.f
         GROUP BY r.u, r.it, r.r)
SELECT round(sqrt(avg((r - p) * (r - p))), 6) AS rmse FROM pred"""


# ---------------------------------------------------------------------------
# WALS at k=1 (mirrors algos/als.py::wals with one latent factor: the
# per-vertex weighted normal-equation solve collapses to a scalar
# closed form, so the whole alternation replays in SQL)
# ---------------------------------------------------------------------------

RATINGS_W_CTE = (
    "ratings AS (SELECT l_suppkey AS u, l_partkey AS it, "
    "CAST(min(l_quantity) AS DOUBLE) / 50.0 AS r, "
    "CAST(count(*) AS DOUBLE) AS w FROM lineitem GROUP BY 1, 2)")


def sql_wals1_user_factors(iterations: int = 3, reg: float = 0.01) -> str:
    init = sql_lcg_hash("b.id * 31 + 13")  # side=1, c=0 portable init
    uv = f"""(SELECT r.u AS id,
        sum(r.w * r.r * q.v) / (sum(r.w * q.v * q.v) + {reg!r}) AS v
 FROM ratings r JOIN fac q ON q.side = 1 AND q.id = r.it
 GROUP BY r.u)"""
    iv = f"""(SELECT r.it AS id,
        sum(r.w * r.r * p.v) / (sum(r.w * p.v * p.v) + {reg!r}) AS v
 FROM ratings r JOIN {uv} p ON p.id = r.u
 GROUP BY r.it)"""
    return f"""
WITH RECURSIVE
{RATINGS_W_CTE},
fac(iter, side, id, v) AS (
  SELECT 0, 1, b.id, 0.1 * ({init} / 2147483648.0)
  FROM (SELECT DISTINCT it AS id FROM ratings) b
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, 0 AS side, un.id, un.v
    FROM {uv} un CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
    UNION ALL
    SELECT m.iter + 1, 1, inew.id, inew.v
    FROM {iv} inew CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
  )
)
SELECT id, round(v, 6) AS v FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


# ---------------------------------------------------------------------------
# ALS at k=2 (mirrors algos/als.py::wals with unit weights — identical
# normal equations to als() but with the portable LCG init: the 2x2
# per-vertex solve is a Cramer's-rule closed form, so the alternation
# replays in SQL; together with WALS k=1 this value-oracles the ALS
# family's solve at both expressible ranks)
# ---------------------------------------------------------------------------


def sql_als2_user_factors(iterations: int = 2, reg: float = 0.01) -> str:
    init1 = sql_lcg_hash("b.id * 31 + 13")        # side=1, c=0
    init2 = sql_lcg_hash("b.id * 31 + 20")        # side=1, c=1
    cramer = """(b1*a22 - b2*a12) / (a11*a22 - a12*a12) AS v1,
        (a11*b2 - a12*b1) / (a11*a22 - a12*a12) AS v2"""
    uv = f"""(SELECT id, {cramer}
 FROM (SELECT r.u AS id,
              sum(q.v1*q.v1) + {reg!r} AS a11, sum(q.v1*q.v2) AS a12,
              sum(q.v2*q.v2) + {reg!r} AS a22,
              sum(r.r*q.v1) AS b1, sum(r.r*q.v2) AS b2
       FROM ratings r JOIN fac q ON q.side = 1 AND q.id = r.it
       GROUP BY r.u))"""
    iv = f"""(SELECT id, {cramer}
 FROM (SELECT r.it AS id,
              sum(p.v1*p.v1) + {reg!r} AS a11, sum(p.v1*p.v2) AS a12,
              sum(p.v2*p.v2) + {reg!r} AS a22,
              sum(r.r*p.v1) AS b1, sum(r.r*p.v2) AS b2
       FROM ratings r JOIN {uv} p ON p.id = r.u
       GROUP BY r.it))"""
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
fac(iter, side, id, v1, v2) AS (
  SELECT 0, 1, b.id, 0.1 * ({init1} / 2147483648.0),
               0.1 * ({init2} / 2147483648.0)
  FROM (SELECT DISTINCT it AS id FROM ratings) b
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, 0 AS side, un.id, un.v1, un.v2
    FROM {uv} un CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
    UNION ALL
    SELECT m.iter + 1, 1, inew.id, inew.v1, inew.v2
    FROM {iv} inew CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
  )
)
SELECT id, round(v1, 6) AS v1, round(v2, 6) AS v2 FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


def sql_als2_regnormal_user_factors(iterations: int = 2,
                                    reg: float = 0.01) -> str:
    """ALS k=2 with the reference's ``--regnormal`` mode
    (``als.cpp:323-326``): lambda scales with ``vertex.num_out_edges()``
    — the user's rating count — and is ZERO for items (no out-edges in
    the user->item orientation of ``als.cpp:415``).  Same Cramer
    closed form as :func:`sql_als2_user_factors`; items solve
    unregularized (sound here: every part has >=8 distinct suppliers in
    the lineitem-derived ratings, so the 2x2 item system is full-rank)."""
    init1 = sql_lcg_hash("b.id * 31 + 13")        # side=1, c=0
    init2 = sql_lcg_hash("b.id * 31 + 20")        # side=1, c=1
    cramer = """(b1*a22 - b2*a12) / (a11*a22 - a12*a12) AS v1,
        (a11*b2 - a12*b1) / (a11*a22 - a12*a12) AS v2"""
    uv = f"""(SELECT id, {cramer}
 FROM (SELECT r.u AS id,
              sum(q.v1*q.v1) + {reg!r} * count(*) AS a11,
              sum(q.v1*q.v2) AS a12,
              sum(q.v2*q.v2) + {reg!r} * count(*) AS a22,
              sum(r.r*q.v1) AS b1, sum(r.r*q.v2) AS b2
       FROM ratings r JOIN fac q ON q.side = 1 AND q.id = r.it
       GROUP BY r.u))"""
    iv = f"""(SELECT id, {cramer}
 FROM (SELECT r.it AS id,
              sum(p.v1*p.v1) AS a11, sum(p.v1*p.v2) AS a12,
              sum(p.v2*p.v2) AS a22,
              sum(r.r*p.v1) AS b1, sum(r.r*p.v2) AS b2
       FROM ratings r JOIN {uv} p ON p.id = r.u
       GROUP BY r.it))"""
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
fac(iter, side, id, v1, v2) AS (
  SELECT 0, 1, b.id, 0.1 * ({init1} / 2147483648.0),
               0.1 * ({init2} / 2147483648.0)
  FROM (SELECT DISTINCT it AS id FROM ratings) b
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, 0 AS side, un.id, un.v1, un.v2
    FROM {uv} un CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
    UNION ALL
    SELECT m.iter + 1, 1, inew.id, inew.v1, inew.v2
    FROM {iv} inew CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
  )
)
SELECT id, round(v1, 6) AS v1, round(v2, 6) AS v2 FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


# ---------------------------------------------------------------------------
# MPLP MAP labels (mirrors algos/mplp.py; K=2, ln(PSI) Potts pairwise)
# ---------------------------------------------------------------------------

def sql_mplp_labels(iterations: int = 10) -> str:
    import math as _math
    u = sql_lcg_hash("id")
    lth = [[repr(_math.log(p)) for p in row] for row in PSI_SQL]
    lphi = _gm_lphi()
    fdeg = _GM_FDEG
    alpha = ("alph AS (SELECT c.src, c.dst, "
             "1.0 / greatest(u.dg, v.dg) AS alpha FROM canon c "
             "JOIN fdeg u ON u.id = c.src JOIN fdeg v ON v.id = c.dst)")
    sums = """(SELECT id, sum(s0) AS s0, sum(s1) AS s1 FROM (
        SELECT src AS id, du0 AS s0, du1 AS s1 FROM mp
        UNION ALL SELECT dst, dv0, dv1 FROM mp) GROUP BY id)"""
    rec = f"""
mp(iter, src, dst, du0, du1, dv0, dv1) AS (
  SELECT 0, src, dst, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE) FROM canon
  UNION ALL
  SELECT * FROM (
    SELECT iter, src, dst,
           (1 - alpha) * du0 + alpha *
           (-cu0 / 2 + greatest({lth[0][0]} + cv0, {lth[0][1]} + cv1) / 2)
               AS du0,
           (1 - alpha) * du1 + alpha *
           (-cu1 / 2 + greatest({lth[1][0]} + cv0, {lth[1][1]} + cv1) / 2)
               AS du1,
           (1 - alpha) * dv0 + alpha *
           (-cv0 / 2 + greatest({lth[0][0]} + cu0, {lth[1][0]} + cu1) / 2)
               AS dv0,
           (1 - alpha) * dv1 + alpha *
           (-cv1 / 2 + greatest({lth[0][1]} + cu0, {lth[1][1]} + cu1) / 2)
               AS dv1
    FROM (
      SELECT m.iter + 1 AS iter, m.src, m.dst, al.alpha,
             m.du0, m.du1, m.dv0, m.dv1,
             a.t0 + su.s0 - m.du0 AS cu0, a.t1 + su.s1 - m.du1 AS cu1,
             b.t0 + sv.s0 - m.dv0 AS cv0, b.t1 + sv.s1 - m.dv1 AS cv1
      FROM mp m
      JOIN {sums} su ON su.id = m.src
      JOIN {sums} sv ON sv.id = m.dst
      JOIN lphi a ON a.id = m.src
      JOIN lphi b ON b.id = m.dst
      JOIN alph al ON al.src = m.src AND al.dst = m.dst
      WHERE m.iter < {iterations}
    )
  )
)"""
    return (_rec(_VERTS, _SYM, _CANON, lphi, fdeg, alpha, rec) + """
, fs AS (SELECT id, sum(s0) AS s0, sum(s1) AS s1 FROM (
    SELECT src AS id, du0 AS s0, du1 AS s1 FROM mp
    WHERE iter = (SELECT max(iter) FROM mp)
    UNION ALL
    SELECT dst, dv0, dv1 FROM mp
    WHERE iter = (SELECT max(iter) FROM mp)) GROUP BY id)
SELECT p.id,
       CASE WHEN p.t1 + coalesce(fs.s1, 0.0) > p.t0 + coalesce(fs.s0, 0.0)
            THEN 1 ELSE 0 END AS label
FROM lphi p LEFT JOIN fs USING (id)""")


def sql_mplp_table_labels(iterations: int = 10) -> str:
    """General factor-table MPLP (mirrors algos/mplp.py::
    mplp_table_labels at K=2) — same recursion as
    :func:`sql_mplp_labels` but THETA_ij comes from each factor's own
    portable-LCG table instead of the shared Potts constant."""
    u = sql_lcg_hash("id")

    def t(x: int, y: int) -> str:
        h = sql_lcg_hash(f"c.src * 9 + c.dst * 31 + {x * 2 + y}")
        return f"-(0.2 + 0.6 * ({h} / 2147483648.0))"

    lphi = _gm_lphi()
    etab = (f"etab AS (SELECT c.src, c.dst, {t(0, 0)} AS t00, "
            f"{t(0, 1)} AS t01, {t(1, 0)} AS t10, {t(1, 1)} AS t11 "
            "FROM canon c)")
    fdeg = _GM_FDEG
    alpha = ("alph AS (SELECT c.src, c.dst, "
             "1.0 / greatest(u.dg, v.dg) AS alpha FROM canon c "
             "JOIN fdeg u ON u.id = c.src JOIN fdeg v ON v.id = c.dst)")
    sums = """(SELECT id, sum(s0) AS s0, sum(s1) AS s1 FROM (
        SELECT src AS id, du0 AS s0, du1 AS s1 FROM mp
        UNION ALL SELECT dst, dv0, dv1 FROM mp) GROUP BY id)"""
    rec = f"""
mp(iter, src, dst, du0, du1, dv0, dv1) AS (
  SELECT 0, src, dst, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
         CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE) FROM canon
  UNION ALL
  SELECT * FROM (
    SELECT iter, src, dst,
           (1 - alpha) * du0 + alpha *
           (-cu0 / 2 + greatest(t00 + cv0, t01 + cv1) / 2) AS du0,
           (1 - alpha) * du1 + alpha *
           (-cu1 / 2 + greatest(t10 + cv0, t11 + cv1) / 2) AS du1,
           (1 - alpha) * dv0 + alpha *
           (-cv0 / 2 + greatest(t00 + cu0, t10 + cu1) / 2) AS dv0,
           (1 - alpha) * dv1 + alpha *
           (-cv1 / 2 + greatest(t01 + cu0, t11 + cu1) / 2) AS dv1
    FROM (
      SELECT m.iter + 1 AS iter, m.src, m.dst, al.alpha,
             et.t00, et.t01, et.t10, et.t11,
             m.du0, m.du1, m.dv0, m.dv1,
             a.t0 + su.s0 - m.du0 AS cu0, a.t1 + su.s1 - m.du1 AS cu1,
             b.t0 + sv.s0 - m.dv0 AS cv0, b.t1 + sv.s1 - m.dv1 AS cv1
      FROM mp m
      JOIN {sums} su ON su.id = m.src
      JOIN {sums} sv ON sv.id = m.dst
      JOIN lphi a ON a.id = m.src
      JOIN lphi b ON b.id = m.dst
      JOIN etab et ON et.src = m.src AND et.dst = m.dst
      JOIN alph al ON al.src = m.src AND al.dst = m.dst
      WHERE m.iter < {iterations}
    )
  )
)"""
    return (_rec(_VERTS, _SYM, _CANON, lphi, etab, fdeg, alpha, rec) + """
, fs AS (SELECT id, sum(s0) AS s0, sum(s1) AS s1 FROM (
    SELECT src AS id, du0 AS s0, du1 AS s1 FROM mp
    WHERE iter = (SELECT max(iter) FROM mp)
    UNION ALL
    SELECT dst, dv0, dv1 FROM mp
    WHERE iter = (SELECT max(iter) FROM mp)) GROUP BY id)
SELECT p.id,
       CASE WHEN p.t1 + coalesce(fs.s1, 0.0) > p.t0 + coalesce(fs.s0, 0.0)
            THEN 1 ELSE 0 END AS label
FROM lphi p LEFT JOIN fs USING (id)""")


# ---------------------------------------------------------------------------
# dual decomposition (mirrors algos/dd.py; edge slaves, subgradient)
# ---------------------------------------------------------------------------

def sql_dd_labels(iterations: int = 10, step0: float = 0.5) -> str:
    lphi = _gm_lphi()
    fdeg = _GM_FDEG
    un = _GM_UN
    base = ("base AS (SELECT c.src, c.dst, a.u0 AS au0, a.u1 AS au1, "
            "b.u0 AS bv0, b.u1 AS bv1 FROM canon c "
            "JOIN un a ON a.id = c.src JOIN un b ON b.id = c.dst)")

    choice = _gm_choice

    z = "CAST(0.0 AS DOUBLE)"
    xi0, xj0 = choice(z, z, z, z)
    nl = {
        "lu0": f"(lu0 + alpha * (vu1 - xi))",
        "lu1": f"(lu1 + alpha * (xi - vu1))",
        "lv0": f"(lv0 + alpha * (vv1 - xj))",
        "lv1": f"(lv1 + alpha * (xj - vv1))",
    }
    xi1, xj1 = choice(nl["lu0"], nl["lu1"], nl["lv0"], nl["lv1"])
    votes = """(SELECT id, avg(x) AS v1 FROM (
        SELECT src AS id, CAST(xi AS DOUBLE) AS x FROM dd
        UNION ALL SELECT dst, CAST(xj AS DOUBLE) FROM dd) GROUP BY id)"""
    rec = f"""
dd(iter, src, dst, au0, au1, bv0, bv1, lu0, lu1, lv0, lv1, xi, xj) AS (
  SELECT 0, src, dst, au0, au1, bv0, bv1, {z}, {z}, {z}, {z},
         {xi0}, {xj0}
  FROM base
  UNION ALL
  SELECT * FROM (
    SELECT iter, src, dst, au0, au1, bv0, bv1,
           {nl['lu0']} AS lu0, {nl['lu1']} AS lu1,
           {nl['lv0']} AS lv0, {nl['lv1']} AS lv1,
           {xi1} AS xi, {xj1} AS xj
    FROM (
      SELECT m.iter + 1 AS iter, m.src, m.dst,
             m.au0, m.au1, m.bv0, m.bv1,
             m.lu0, m.lu1, m.lv0, m.lv1,
             CAST(m.xi AS DOUBLE) AS xi, CAST(m.xj AS DOUBLE) AS xj,
             {step0!r} / (1.0 + m.iter) AS alpha,
             su.v1 AS vu1, sv.v1 AS vv1
      FROM dd m
      JOIN {votes} su ON su.id = m.src
      JOIN {votes} sv ON sv.id = m.dst
      WHERE m.iter < {iterations}
    )
  )
)"""
    return (_rec(_VERTS, _SYM, _CANON, lphi, fdeg, un, base, rec) + """
, fv AS (SELECT id, avg(x) AS v1 FROM (
    SELECT src AS id, CAST(xi AS DOUBLE) AS x FROM dd
    WHERE iter = (SELECT max(iter) FROM dd)
    UNION ALL
    SELECT dst, CAST(xj AS DOUBLE) FROM dd
    WHERE iter = (SELECT max(iter) FROM dd)) GROUP BY id)
SELECT id, CASE WHEN v1 > 0.5 THEN 1 ELSE 0 END AS label FROM fv""")


def sql_dd_projected_labels(iterations: int = 10,
                            step0: float = 0.5) -> str:
    """Replays :func:`graphlab_spark.algos.dd.dd_projected_labels`:
    the same lexicographic slave argmax with +duals, the consensus
    dual step ``lambda += alpha (q - p)`` with
    ``alpha = step0 / (2t + 3)``, and the ``q > 0.5`` unary decode."""
    lphi = _gm_lphi()
    fdeg = _GM_FDEG
    un = _GM_UN
    base = ("base AS (SELECT c.src, c.dst, a.u0 AS au0, a.u1 AS au1, "
            "b.u0 AS bv0, b.u1 AS bv1 FROM canon c "
            "JOIN un a ON a.id = c.src JOIN un b ON b.id = c.dst)")

    choice = _gm_choice

    z = "CAST(0.0 AS DOUBLE)"
    xi0, xj0 = choice(z, z, z, z)
    nl = {
        "lu0": "(lu0 + alpha * (xi - vu1))",
        "lu1": "(lu1 + alpha * (vu1 - xi))",
        "lv0": "(lv0 + alpha * (xj - vv1))",
        "lv1": "(lv1 + alpha * (vv1 - xj))",
    }
    xi1, xj1 = choice(nl["lu0"], nl["lu1"], nl["lv0"], nl["lv1"])
    votes = """(SELECT id, avg(p) AS q1 FROM (
        SELECT src AS id, CAST(xi AS DOUBLE) AS p FROM ddp
        UNION ALL SELECT dst, CAST(xj AS DOUBLE) FROM ddp) GROUP BY id)"""
    rec = f"""
ddp(iter, src, dst, au0, au1, bv0, bv1, lu0, lu1, lv0, lv1, xi, xj) AS (
  SELECT 0, src, dst, au0, au1, bv0, bv1, {z}, {z}, {z}, {z},
         {xi0}, {xj0}
  FROM base
  UNION ALL
  SELECT * FROM (
    SELECT iter, src, dst, au0, au1, bv0, bv1,
           {nl['lu0']} AS lu0, {nl['lu1']} AS lu1,
           {nl['lv0']} AS lv0, {nl['lv1']} AS lv1,
           {xi1} AS xi, {xj1} AS xj
    FROM (
      SELECT m.iter + 1 AS iter, m.src, m.dst,
             m.au0, m.au1, m.bv0, m.bv1,
             m.lu0, m.lu1, m.lv0, m.lv1,
             CAST(m.xi AS DOUBLE) AS xi, CAST(m.xj AS DOUBLE) AS xj,
             {step0!r} / (2.0 * m.iter + 3.0) AS alpha,
             su.q1 AS vu1, sv.q1 AS vv1
      FROM ddp m
      JOIN {votes} su ON su.id = m.src
      JOIN {votes} sv ON sv.id = m.dst
      WHERE m.iter < {iterations}
    )
  )
)"""
    return (_rec(_VERTS, _SYM, _CANON, lphi, fdeg, un, base, rec) + """
, fq AS (SELECT id, avg(p) AS q1 FROM (
    SELECT src AS id, CAST(xi AS DOUBLE) AS p FROM ddp
    WHERE iter = (SELECT max(iter) FROM ddp)
    UNION ALL
    SELECT dst, CAST(xj AS DOUBLE) FROM ddp
    WHERE iter = (SELECT max(iter) FROM ddp)) GROUP BY id)
SELECT id, CASE WHEN q1 > 0.5 THEN 1 ELSE 0 END AS label FROM fq""")


# ---------------------------------------------------------------------------
# AD3 / ADMM dual decomposition (mirrors algos/ad3.py)
# ---------------------------------------------------------------------------

def sql_ad3_labels(iterations: int = 10, step: float = 1.0) -> str:
    """Replays :func:`graphlab_spark.algos.ad3.ad3_labels` exactly: the
    same unary shares, the same closed-form binary-pairwise QP (the
    Potts ``Dq`` is a positive literal, so only the supermodular branch
    is emitted — Spark constant-folds the same way), the same fused
    round ``p = QP(q, dl)`` → ``q = avg(p)`` → ``dl += 2 step (q-p)``."""
    import math as _math
    u = sql_lcg_hash("id")
    t = [[_math.log(p) for p in row] for row in PSI_SQL]
    dq = repr(t[1][1] + t[0][0] - t[1][0] - t[0][1])
    cu_const = repr(t[1][0] - t[0][0] + 1.0)
    cv_const = repr(t[0][1] - t[0][0] + 1.0)
    lphi = _gm_lphi()
    fdeg = _GM_FDEG
    un = _GM_UN
    base = (f"base AS (SELECT c.src, c.dst, "
            f"a.u1 - a.u0 + {cu_const} AS cu, "
            f"b.u1 - b.u0 + {cv_const} AS cv FROM canon c "
            "JOIN un a ON a.id = c.src JOIN un b ON b.id = c.dst)")

    def clip(e: str) -> str:
        return f"least(1.0, greatest(0.0, {e}))"

    def qp(a: str, b: str) -> tuple[str, str]:
        x1 = clip(f"({a} + {dq}) * 0.5")
        y1 = clip(f"({b}) * 0.5")
        x2 = clip(f"({a}) * 0.5")
        y2 = clip(f"({b} + {dq}) * 0.5")
        w = clip(f"({a} + {b} + {dq}) * 0.25")
        px = (f"CASE WHEN {x1} <= {y1} THEN {x1} "
              f"WHEN {y2} <= {x2} THEN {x2} ELSE {w} END")
        py = (f"CASE WHEN {x1} <= {y1} THEN {y1} "
              f"WHEN {y2} <= {x2} THEN {y2} ELSE {w} END")
        return px, py

    px0, py0 = qp("2.0 * 0.5 - 1.0 + 0.0 + cu", "2.0 * 0.5 - 1.0 + 0.0 + cv")
    px, py = qp("A", "B")
    qavg = """(SELECT id, avg(p) AS q FROM (
        SELECT src AS id, pu AS p FROM ad3
        UNION ALL SELECT dst, pv FROM ad3) GROUP BY id)"""
    rec = f"""
ad3(iter, src, dst, cu, cv, dlu, dlv, pu, pv) AS (
  SELECT 0, src, dst, cu, cv, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
         {px0}, {py0}
  FROM base
  UNION ALL
  SELECT * FROM (
    SELECT iter, src, dst, cu, cv, dlu, dlv,
           {px} AS pu, {py} AS pv
    FROM (
      SELECT iter, src, dst, cu, cv, dlu, dlv,
             2.0 * qu - 1.0 + dlu + cu AS A,
             2.0 * qv - 1.0 + dlv + cv AS B
      FROM (
        SELECT m.iter + 1 AS iter, m.src, m.dst, m.cu, m.cv,
               m.dlu + 2.0 * {step!r} * (su.q - m.pu) AS dlu,
               m.dlv + 2.0 * {step!r} * (sv.q - m.pv) AS dlv,
               su.q AS qu, sv.q AS qv
        FROM ad3 m
        JOIN {qavg} su ON su.id = m.src
        JOIN {qavg} sv ON sv.id = m.dst
        WHERE m.iter < {iterations - 1}
      )
    )
  )
)"""
    return (_rec(_VERTS, _SYM, _CANON, lphi, fdeg, un, base, rec) + """
, fq AS (SELECT id, avg(p) AS q FROM (
    SELECT src AS id, pu AS p FROM ad3
    WHERE iter = (SELECT max(iter) FROM ad3)
    UNION ALL
    SELECT dst, pv FROM ad3
    WHERE iter = (SELECT max(iter) FROM ad3)) GROUP BY id)
SELECT id, CASE WHEN q > 0.5 THEN 1 ELSE 0 END AS label FROM fq""")


def sql_bethe_admm_labels(iterations: int = 10, step: float = 1.0,
                          alpha: float = 1.0) -> str:
    """Replays :func:`graphlab_spark.algos.ad3.bethe_admm_labels`: the
    same fused ADMM round — dual step, exponentiated-gradient etas with
    the Bethe gradient folded in, one single-factor sum-product pass,
    normalize, clamp at 1e-99 — in a layered recursive CTE.  The first
    round reuses the generic step (with q = b = 0.5 the dual update is
    an exact IEEE no-op, matching the engine's skipped update)."""
    import math as _math
    lth = [[_math.log(p) for p in row] for row in PSI_SQL]
    feb = {(x, y): repr(10.0 ** (lth[x][y] / float(alpha)))
           for x in (0, 1) for y in (0, 1)}
    st, al = repr(float(step)), repr(float(alpha))
    u = sql_lcg_hash("id")
    lphi = _gm_lphi()
    fdeg = _GM_FDEG
    un = _GM_UN
    binit = ("binit AS (SELECT c.src, c.dst, "
             "a.u0 AS shu0, a.u1 AS shu1, b.u0 AS shv0, b.u1 AS shv1, "
             "CAST(0.0 AS DOUBLE) AS lu0, CAST(0.0 AS DOUBLE) AS lu1, "
             "CAST(0.0 AS DOUBLE) AS lv0, CAST(0.0 AS DOUBLE) AS lv1, "
             "0.5 AS bu0, 0.5 AS bu1, 0.5 AS bv0, 0.5 AS bv1, "
             "0.25 AS fb00, 0.25 AS fb01, 0.25 AS fb10, 0.25 AS fb11, "
             "0.5 AS qu0, 0.5 AS qu1, 0.5 AS qv0, 0.5 AS qv1 "
             "FROM canon c JOIN un a ON a.id = c.src "
             "JOIN un b ON b.id = c.dst)")

    carry = ("src, dst, shu0, shu1, shv0, shv1, "
             "lu0, lu1, lv0, lv1")

    def clampe(e: str) -> str:
        return f"CASE WHEN {e} < 1e-99 THEN 1e-99 ELSE {e} END"

    def step_sql(iter_expr: str, src_rel: str) -> str:
        """One fused round over src_rel, which must provide
        (src, dst, sh*, lu* pre-update, b*, fb*, q*)."""
        dual = ", ".join(
            f"l{s}{k} + {st} * (q{s}{k} - b{s}{k}) AS l{s}{k}"
            for s in ("u", "v") for k in (0, 1))
        la = (f"(SELECT {iter_expr} AS iter, src, dst, "
              "shu0, shu1, shv0, shv1, "
              f"{dual}, bu0, bu1, bv0, bv1, "
              "fb00, fb01, fb10, fb11, qu0, qu1, qv0, qv1 "
              f"FROM {src_rel})")
        ue = ", ".join(
            f"power(10.0, (l{s}{k} + sh{s}{k} + {st} * (q{s}{k} - b{s}{k}))"
            f" / {al}) * 10.0 * b{s}{k} AS ue{s}{k}"
            for s in ("u", "v") for k in (0, 1))
        fe = ", ".join(
            f"{feb[(x, y)]} * fb{x}{y} / 10.0 / (bu{x} * bv{y}) AS fe{x}{y}"
            for x in (0, 1) for y in (0, 1))
        lb = (f"(SELECT iter, {carry}, {ue}, {fe} FROM {la})")
        joint = ", ".join(
            f"fe{x}{y} * ueu{x} * uev{y} AS j{x}{y}"
            for x in (0, 1) for y in (0, 1))
        mu = ", ".join(
            f"ueu{x} * (fe{x}0 * uev0 + fe{x}1 * uev1) AS mu{x}"
            for x in (0, 1))
        mv = ", ".join(
            f"uev{y} * (fe0{y} * ueu0 + fe1{y} * ueu1) AS mv{y}"
            for y in (0, 1))
        lc = f"(SELECT iter, {carry}, {joint}, {mu}, {mv} FROM {lb})"
        outs = ", ".join(
            [clampe(f"mu{x} / (mu0 + mu1)") + f" AS bu{x}" for x in (0, 1)]
            + [clampe(f"mv{y} / (mv0 + mv1)") + f" AS bv{y}"
               for y in (0, 1)]
            + [clampe(f"j{x}{y} / (j00 + j01 + j10 + j11)") + f" AS fb{x}{y}"
               for x in (0, 1) for y in (0, 1)])
        return f"SELECT iter, {carry}, {outs} FROM {lc}"

    qavg = """(SELECT id, avg(p0) AS q0, avg(p1) AS q1 FROM (
        SELECT src AS id, bu0 AS p0, bu1 AS p1 FROM ba
        UNION ALL SELECT dst, bv0, bv1 FROM ba) GROUP BY id)"""
    joined = (f"(SELECT m.iter AS piter, m.src, m.dst, "
              "m.shu0, m.shu1, m.shv0, m.shv1, "
              "m.lu0, m.lu1, m.lv0, m.lv1, "
              "m.bu0, m.bu1, m.bv0, m.bv1, "
              "m.fb00, m.fb01, m.fb10, m.fb11, "
              "su.q0 AS qu0, su.q1 AS qu1, sv.q0 AS qv0, sv.q1 AS qv1 "
              f"FROM ba m JOIN {qavg} su ON su.id = m.src "
              f"JOIN {qavg} sv ON sv.id = m.dst "
              f"WHERE m.iter < {iterations - 1})")
    cols = (f"iter, {carry}, bu0, bu1, bv0, bv1, fb00, fb01, fb10, fb11")
    rec = f"""
ba({cols}) AS (
  {step_sql("0", "binit")}
  UNION ALL
  SELECT * FROM ({step_sql("piter + 1", joined)})
)"""
    return (_rec(_VERTS, _SYM, _CANON, lphi, fdeg, un, binit, rec) + """
, fq AS (SELECT id, avg(p0) AS q0, avg(p1) AS q1 FROM (
    SELECT src AS id, bu0 AS p0, bu1 AS p1 FROM ba
    WHERE iter = (SELECT max(iter) FROM ba)
    UNION ALL
    SELECT dst, bv0, bv1 FROM ba
    WHERE iter = (SELECT max(iter) FROM ba)) GROUP BY id)
SELECT id, CASE WHEN q1 > q0 THEN 1 ELSE 0 END AS label FROM fq""")


def sql_budget_map(budget: int = 3) -> str:
    """Replays :func:`graphlab_spark.algos.ad3.budget_map_select` over
    in-neighborhood budget factors (``__spark_entry__.q_budget_map``):
    row_number per factor ordered by (theta desc, member asc), selected
    iff nonnegative score within the budget."""
    u = sql_lcg_hash("id")
    th = (f"th AS (SELECT id, "
          f"ln(0.3 + 0.4 * ({u} / 2147483648.0)) "
          f"- ln(1.0 - (0.3 + 0.4 * ({u} / 2147483648.0))) AS theta "
          "FROM verts)")
    fac = "fac AS (SELECT DISTINCT dst AS fid, src AS member FROM edges)"
    r = ("r AS (SELECT f.fid, f.member, t.theta, "
         "row_number() OVER (PARTITION BY f.fid "
         "ORDER BY t.theta DESC, f.member ASC) AS rk "
         "FROM fac f JOIN th t ON t.id = f.member)")
    return (_rec(_VERTS, th, fac, r) + f"""
SELECT fid, member,
       CASE WHEN theta >= 0.0 AND rk <= {budget} THEN 1 ELSE 0 END
       AS selected
FROM r""")


# ---------------------------------------------------------------------------
# AdPredictor (mirrors algos/adpredictor.py; A&S-polynomial probit)
# ---------------------------------------------------------------------------

def sql_adpredictor_weights(iterations: int = 3) -> str:
    from .operators.portable import INV_SQRT_2PI, sql_phi
    est = """(SELECT e.u, e.it, e.y, su.sig AS sig_u, si.sig AS sig_i,
        su.mu + si.mu AS m, su.sig + si.sig AS s
 FROM ex e JOIN st su ON su.side = 1 AND su.id = e.u
           JOIN st si ON si.side = 2 AND si.id = e.it)"""
    phi_t = sql_phi("t")
    scored = f"""(SELECT u, it, y, sig_u, sig_i, s, vt,
        vt * (vt + t) AS wt FROM
  (SELECT *, {INV_SQRT_2PI!r} * exp(-t * t / 2)
          / (CASE WHEN {phi_t} = 0.0 THEN 1e-5 ELSE {phi_t} END) AS vt
   FROM (SELECT *, y * m / sqrt(s) AS t FROM {est})))"""
    return f"""
WITH RECURSIVE
ex AS (SELECT l_suppkey AS u, l_partkey AS it,
       CASE WHEN max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
            THEN 1.0 ELSE -1.0 END AS y
       FROM lineitem GROUP BY 1, 2),
st(iter, side, id, mu, sig) AS (
  SELECT 0, sd.side, sd.id, CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)
  FROM (SELECT 1 AS side, u AS id FROM (SELECT DISTINCT u FROM ex)
        UNION ALL
        SELECT 2, it FROM (SELECT DISTINCT it FROM ex)) sd
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.side, p.id,
           p.mu + coalesce(g.dmu, 0.0) AS mu,
           p.sig * exp(coalesce(g.lnf, 0.0)) AS sig
    FROM st p
    LEFT JOIN (
      SELECT side, id, sum(dmu) AS dmu, sum(lnf) AS lnf FROM (
        SELECT 1 AS side, u AS id,
               (y * sig_u / sqrt(s)) * vt AS dmu,
               ln(greatest(1.0 - (sig_u / s) * wt, 1e-6)) AS lnf
        FROM {scored}
        UNION ALL
        SELECT 2, it, (y * sig_i / sqrt(s)) * vt,
               ln(greatest(1.0 - (sig_i / s) * wt, 1e-6))
        FROM {scored}
      ) GROUP BY side, id
    ) g ON p.side = g.side AND p.id = g.id
    WHERE p.iter < {iterations}
  )
)
SELECT side, id, round(mu, 6) AS mu, round(sig, 6) AS sig FROM st
WHERE iter = (SELECT max(iter) FROM st)"""


# ---------------------------------------------------------------------------
# Jacobi solver on the link graph (mirrors algos/jacobi.py on the
# Laplacian-derived diagonally-dominant system of q_jacobi)
# ---------------------------------------------------------------------------

def sql_jacobi(tol: float = 1e-9, max_supersteps: int = 500) -> str:
    b = sql_unit_interval("v.id")
    vb = (f"vb AS (SELECT v.id, {b} AS b, d.dg + 1.0 AS diag "
          f"FROM verts v JOIN (SELECT src AS id, count(*) AS dg "
          f"FROM sym GROUP BY 1) d ON d.id = v.id)")
    rec = f"""
jac(iter, id, x, md) AS (
  SELECT 0, id, b / diag, CAST(1e12 AS DOUBLE) FROM vb
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           (vb.b - coalesce(m.s, 0.0)) / vb.diag AS x,
           max(abs((vb.b - coalesce(m.s, 0.0)) / vb.diag - p.x))
               OVER () AS md
    FROM jac p
    JOIN vb ON vb.id = p.id
    LEFT JOIN (SELECT s.dst, sum(-1.0 * p2.x) AS s
               FROM jac p2 JOIN sym s ON p2.id = s.src
               GROUP BY s.dst) m ON p.id = m.dst
    WHERE p.md > {tol!r} AND p.iter < {max_supersteps}
  )
)"""
    return (_rec(_VERTS, _SYM, vb, rec) + """
SELECT id, round(x, 6) AS x FROM jac
WHERE iter = (SELECT max(iter) FROM jac)""")


# ---------------------------------------------------------------------------
# category-mediated shortest paths (mirrors algos/catpath.py on the
# events-derived typed graph: articles = event ids, categories = type hubs)
# ---------------------------------------------------------------------------

_CATPATH_EDGES = """
catc AS (
    SELECT DISTINCT least(ha.dst, hb.dst) AS a, greatest(ha.dst, hb.dst) AS b
    FROM seq s JOIN hub ha ON s.src = ha.src JOIN hub hb ON s.dst = hb.src
    WHERE s.dst IS NOT NULL AND ha.dst <> hb.dst
),
tedges AS (
    SELECT src, dst, TRUE AS src_is_art FROM hub
    UNION ALL SELECT dst AS src, src AS dst, FALSE FROM hub
    UNION ALL SELECT a AS src, b AS dst, FALSE FROM catc
    UNION ALL SELECT b AS src, a AS dst, FALSE FROM catc
)"""


def sql_catpath(max_supersteps: int = 200) -> str:
    """Typed BFS fixpoint of algos/catpath.catpath on the events graph
    (source = min event id).  Each level accumulates the reached set
    and keeps, per vertex, the lexicographically smallest
    (dist, hops, last_art) triple — the same deterministic tie-break
    the Spark loop applies via its min-struct aggregation."""
    rec = f"""
cp(iter, id, dist, hops, last_art, nchanged) AS (
  SELECT 0, (SELECT min(event_id) FROM events), CAST(0.0 AS DOUBLE),
         CAST(0 AS BIGINT), CAST(4611686018427387904 AS BIGINT),
         CAST(1 AS BIGINT)
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, n.id, n.dist, n.hops, n.last_art,
           sum(CASE WHEN q.id IS NULL
                      OR (n.dist, n.hops, n.last_art)
                         < (q.dist, q.hops, q.last_art)
                    THEN 1 ELSE 0 END) OVER () AS nchanged
    FROM (
      SELECT id, dist, hops, last_art FROM (
        SELECT id, dist, hops, last_art,
               row_number() OVER (PARTITION BY id
                                  ORDER BY dist, hops, last_art) AS rn
        FROM (
          SELECT id, dist, hops, last_art FROM cp
          UNION ALL
          SELECT t.dst AS id, p.dist + 1.0 AS dist,
                 CASE WHEN t.src_is_art THEN CAST(1 AS BIGINT)
                      ELSE p.hops + 1 END AS hops,
                 CASE WHEN t.src_is_art THEN t.src
                      ELSE p.last_art END AS last_art
          FROM cp p JOIN tedges t ON p.id = t.src
        )
      ) WHERE rn = 1
    ) n
    LEFT JOIN cp q ON n.id = q.id
    CROSS JOIN (SELECT DISTINCT iter, nchanged FROM cp) m
    WHERE m.nchanged > 0 AND m.iter < {max_supersteps}
  )
)"""
    return (_rec(_CATPATH_EDGES.strip(), rec) + """
SELECT id, dist AS distance,
       CASE WHEN dist = 0 THEN NULL ELSE last_art END AS prev_art,
       CASE WHEN dist = 0 THEN CAST(0 AS BIGINT) ELSE hops END AS cat_hops
FROM cp
WHERE iter = (SELECT max(iter) FROM cp) AND id >= 0""")


# ---------------------------------------------------------------------------
# HITS hubs & authorities (mirrors algos/hits.py, fixed supersteps)
# ---------------------------------------------------------------------------

def sql_hits(supersteps: int = 3) -> str:
    """Fixed-superstep HITS unroll.  Per level: new auth = in-gather of
    the previous hubs; new hub = out-gather of the NEW auths (the inner
    derived table recomputes them — each recursive-term reference sees
    the previous level only, so the auth gather is repeated verbatim).
    All intermediate values are exact small integers in double, so
    Spark and DuckDB agree exactly; one terminal L2 normalization per
    score, rounded to 6dp."""
    rec = f"""
hits(iter, id, hub, auth) AS (
  SELECT 0, id, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE) FROM verts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           coalesce(hn.t, 0.0) AS hub,
           coalesce(an.t, 0.0) AS auth
    FROM hits p
    LEFT JOIN (SELECT e.dst AS id, sum(p2.hub) AS t
               FROM hits p2 JOIN edges e ON p2.id = e.src
               GROUP BY e.dst) an ON p.id = an.id
    LEFT JOIN (SELECT e2.src AS id, sum(na.t2) AS t
               FROM edges e2
               JOIN (SELECT e3.dst AS id, sum(p3.hub) AS t2
                     FROM hits p3 JOIN edges e3 ON p3.id = e3.src
                     GROUP BY e3.dst) na ON e2.dst = na.id
               GROUP BY e2.src) hn ON p.id = hn.id
    WHERE p.iter < {supersteps}
  )
)"""
    return (_rec(_VERTS, rec) + f"""
, fin AS (SELECT id, hub, auth FROM hits WHERE iter = {supersteps}),
nrm AS (SELECT sqrt(sum(hub * hub)) AS nh, sqrt(sum(auth * auth)) AS na
        FROM fin)
SELECT f.id,
       round(CASE WHEN n.nh > 0 THEN f.hub / n.nh ELSE 0.0 END, 6) AS hub,
       round(CASE WHEN n.na > 0 THEN f.auth / n.na ELSE 0.0 END, 6) AS auth
FROM fin f CROSS JOIN nrm n""")


# ---------------------------------------------------------------------------
# personalized PageRank (mirrors algos/pagerank.personalized_pagerank)
# ---------------------------------------------------------------------------

def sql_personalized_pagerank(seeds: tuple[int, ...] = (-1,),
                              tol: float = 1e-6,
                              max_supersteps: int = 200) -> str:
    seed_list = ", ".join(str(int(s)) for s in seeds)
    base = (f"CAST(CASE WHEN id IN ({seed_list}) "
            "THEN 0.15 ELSE 0.0 END AS DOUBLE)")
    outd = ("outd AS (SELECT src AS id, count(*) AS out_degree "
            "FROM edges GROUP BY 1)")
    cont = ("cont AS (SELECT e.src, e.dst, 1.0 / d.out_degree AS cw "
            "FROM edges e JOIN outd d ON e.src = d.id)")
    rec = f"""
ppr(iter, id, rank, md) AS (
  SELECT 0, id, {base}, CAST(1e12 AS DOUBLE) FROM verts
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, p.id,
           ({base.replace('id IN', 'p.id IN')})
             + 0.85 * coalesce(m.t, 0.0) AS rank,
           max(abs(({base.replace('id IN', 'p.id IN')})
                   + 0.85 * coalesce(m.t, 0.0) - p.rank)) OVER () AS md
    FROM ppr p
    LEFT JOIN (SELECT c.dst, sum(p2.rank * c.cw) AS t
               FROM ppr p2 JOIN cont c ON p2.id = c.src
               GROUP BY c.dst) m ON p.id = m.dst
    WHERE p.md > {tol!r} AND p.iter < {max_supersteps}
  )
)"""
    return (_rec(_VERTS, outd, cont, rec)
            + "SELECT id, round(rank, 6) AS rank FROM ppr "
              "WHERE iter = (SELECT max(iter) FROM ppr)")


# ---------------------------------------------------------------------------
# Synthetic ALS data generator (mirrors sources/parsers.py::
# load_synthetic_als — make_synthetic_als_data.cpp:120-177): the whole
# generator is portable-LCG column arithmetic, so the train split
# replays exactly; Box-Muller ln/cos/sqrt/pow agree with Spark-JVM at
# the rounded 6dp (LBP precedent).
# ---------------------------------------------------------------------------


def _sql_synth_unit(expr: str) -> str:
    return f"(({sql_lcg_hash(expr)} + 0.5) / 2147483648.0)"


def _sql_synth_normal(tag: int, ident: str, dim: int, d: int,
                      stdev: float, seed: int) -> str:
    key = f"({ident} * {d} + {dim})"
    u1 = _sql_synth_unit(sql_edge_hash(str(seed + tag), key))
    u2 = _sql_synth_unit(sql_edge_hash(str(seed + tag + 7), key))
    return (f"(sqrt(-2.0 * ln({u1})) * cos(2.0 * pi() * {u2})"
            f" * {stdev!r})")


def sql_synthetic_als_stats(
    nusers: int = 50, nmovies: int = 200, d: int = 3, alpha: float = 1.8,
    stdev: float = 2.0, nvalidate: int = 2, npredict: int = 1,
    seed: int = 31413,
) -> str:
    umax = max(1, nusers - nvalidate - npredict)
    du = _sql_synth_unit(sql_edge_hash(str(seed + 3), "m.movie"))
    deg = (f"least({umax}, CAST(floor(pow(1.0 - {du}, "
           f"{-1.0 / (alpha - 1.0)!r})) AS BIGINT))")
    usr = (f"({sql_edge_hash(sql_edge_hash(str(seed + 4), 'e.movie'), 'e.j')}"
           f" % {nusers})")
    rating = " + ".join(
        f"({_sql_synth_normal(1, 'e.usr', j, d, stdev, seed)} * "
        f"{_sql_synth_normal(2, 'e.movie', j, d, stdev, seed)})"
        for j in range(d))
    return f"""
WITH movies AS (SELECT range AS movie FROM range({nmovies})),
degs AS (SELECT m.movie, {deg} AS deg FROM movies m),
edges AS (
  SELECT e.movie, e.j, {usr} AS usr
  FROM (SELECT g.movie, r.range AS j FROM degs g
        JOIN range(1, {umax} + 1) r ON r.range <= g.deg) e),
train AS (
  SELECT e.usr AS "user", e.movie + {nusers} AS item,
         ({rating}) AS rating
  FROM edges e)
SELECT item, CAST(count(*) AS BIGINT) AS deg,
       round(sum(rating), 6) AS rsum
FROM train GROUP BY item"""


def _sql_image_obs(rows: int, cols: int, ncolors: int, error_rate: float,
                   seed: int) -> tuple[str, str]:
    """Shared generator expressions for the synthetic-image twins
    (``sql_synthetic_image`` and ``sql_gibbs_denoise`` replay the SAME
    pixel table — one source of truth so a generator fix cannot
    desynchronize them): returns (px_cte, obs_color_expr) where the
    obs expression is valid over px's (r, c) columns."""
    cr, cc = rows / 2.0, cols / 2.0
    mr = min(rows, cols) / 2.0
    u = _sql_synth_unit(sql_edge_hash(str(seed + 1), "(r*65536+c)"))
    rc = (f"CAST({sql_edge_hash(str(seed + 2), '(r*65536+c)')} "
          f"% {ncolors} AS INT)")
    ring = (f"CAST(floor(least(1.0, sqrt((r-{cr!r})*(r-{cr!r}) + "
            f"(c-{cc!r})*(c-{cc!r})) / {mr!r}) * {ncolors - 1}) AS INT)")
    true = f"CASE WHEN r < {rows // 2} THEN {ring} ELSE 0 END"
    px = (f"px AS (\n  SELECT CAST(floor(i.range / {cols}) AS BIGINT) AS r,\n"
          f"         CAST(i.range % {cols} AS BIGINT) AS c\n"
          f"  FROM range({rows * cols}) i)")
    obs = (f"CASE WHEN {u} < {error_rate!r} THEN {rc} "
           f"ELSE {true} END")
    return px, obs


def sql_synthetic_image(rows: int = 32, cols: int = 32, ncolors: int = 5,
                        error_rate: float = 0.5, seed: int = 17) -> str:
    """Twin of sources/parsers.py::load_synthetic_image
    (synthetic_image_data.cpp:79-131): radial sunset ring masked at the
    integer horizon, LCG-deterministic uniform color flips."""
    cr, cc = rows / 2.0, cols / 2.0
    mr = min(rows, cols) / 2.0
    ring = (f"CAST(floor(least(1.0, sqrt((r-{cr!r})*(r-{cr!r}) + "
            f"(c-{cc!r})*(c-{cc!r})) / {mr!r}) * {ncolors - 1}) AS INT)")
    px, obs = _sql_image_obs(rows, cols, ncolors, error_rate, seed)
    return f"""
WITH {px}
SELECT r * 65536 + c AS id, r, c,
       CASE WHEN r < {rows // 2} THEN {ring} ELSE 0 END AS true_color,
       {obs} AS obs_color
FROM px"""


def sql_synthetic_clusters_stats(
    num_clusters: int = 4, dim: int = 2, ndata: int = 2000,
    seed: int = 7,
) -> str:
    """Twin of sources/parsers.py::load_synthetic_clusters
    (generate_synthetic.cpp:29-59): Uniform(-10,10) centers,
    hash-uniform cluster picks, Box-Muller unit gaussians — per-cluster
    count + rounded coordinate sums replay the whole generator."""

    def center(j: int) -> str:
        key = f"(cluster * {dim} + {j})"
        u = _sql_synth_unit(sql_edge_hash(str(seed + 1), key))
        return f"(-10.0 + 20.0 * {u})"

    # _sql_synth_normal(tag=3, ...) is the same seed+3/seed+10 draw
    # pair as the generator; stdev=1.0 multiplies by an IEEE-exact 1.0
    sums = ", ".join(
        f"round(sum({_sql_synth_normal(3, 'id', j, dim, 1.0, seed)} "
        f"+ {center(j)}), 6) AS s{j}"
        for j in range(dim))
    return f"""
WITH base AS (
  SELECT i.range AS id,
         CAST({sql_edge_hash(str(seed + 2), 'i.range')} % {num_clusters}
              AS INT) AS cluster
  FROM range({ndata}) i)
SELECT cluster, CAST(count(*) AS BIGINT) AS n, {sums}
FROM base GROUP BY cluster"""


def sql_gibbs_denoise(rows: int = 12, cols: int = 12, error_rate: float = 0.45,
                      lam: float = 0.75, sweeps: int = 3, seed: int = 11,
                      gseed: int = 29) -> str:
    """Twin of algos/gibbs.py::chromatic_gibbs on the K=3 synthetic
    image with Potts smoothing and the bipartite (r+c)%2 grid coloring
    (chromatic_sampler.cpp replay): the recursive CTE advances one
    color step per iteration — parity vertices not on this step's
    color carry their assignment, active ones resample with the same
    mix31-LCG inverse-CDF draw.  Dyadic lam keeps every neighbor sum an
    exact binary multiple, so the Spark-side float aggregation is
    order-independent and the chain replays bit-for-bit (modulo the
    exp/ln libm parity every synthetic oracle here already leans on).
    """
    k = 3
    nsteps = sweeps * 2
    px_cte, obs = _sql_image_obs(rows, cols, k, error_rate, seed)
    off = error_rate / (k - 1)
    thetas = ", ".join(
        f"CASE WHEN obs_color = {x} THEN ln({error_rate!r}) "
        f"ELSE ln({off!r}) END AS t{x}" for x in range(k))
    init = f"CAST({sql_edge_hash(str(gseed), 'id')} % {k} AS INT)"
    h = sql_edge_hash(f"({gseed} + 7 + g.step)", "g.id")
    bs = ", ".join(
        f"g.t{x} - {lam!r} * (g.deg - coalesce(nb.c{x}, 0)) AS b{x}"
        for x in range(k))
    cnts = ", ".join(
        f"sum(CASE WHEN n.asg = {x} THEN 1 ELSE 0 END) AS c{x}"
        for x in range(k))
    es = " + ".join(f"exp(q.b{x} - q.mb)" for x in range(k))
    pick = (f"CASE WHEN q.par != q.step % 2 THEN q.asg "
            f"WHEN exp(q.b0 - q.mb) > q.u * ({es}) THEN 0 "
            f"WHEN exp(q.b0 - q.mb) + exp(q.b1 - q.mb) > q.u * ({es}) "
            f"THEN 1 ELSE 2 END")
    return f"""
WITH RECURSIVE {px_cte},
img AS (
  SELECT r * 65536 + c AS id, r, c, (r + c) % 2 AS par,
         {obs} AS obs_color
  FROM px),
garcs AS (
  SELECT id AS src, (r + 1) * 65536 + c AS dst FROM img
  WHERE r + 1 < {rows}
  UNION ALL
  SELECT id AS src, r * 65536 + c + 1 AS dst FROM img
  WHERE c + 1 < {cols}),
gsym AS (SELECT src, dst FROM garcs
         UNION ALL SELECT dst AS src, src AS dst FROM garcs),
vstat AS (
  SELECT i.id, i.par, d.deg, {thetas}
  FROM img i JOIN (SELECT src AS id, count(*) AS deg FROM gsym
                   GROUP BY src) d ON i.id = d.id),
gibbs(step, id, par, deg, t0, t1, t2, asg) AS (
  SELECT 0, id, par, deg, t0, t1, t2, {init} FROM vstat
  UNION ALL
  SELECT q.step + 1, q.id, q.par, q.deg, q.t0, q.t1, q.t2, {pick}
  FROM (
    SELECT p.*, greatest(p.b0, p.b1, p.b2) AS mb,
           ({sql_mix31('p.h')} + 0.5) / 2147483648.0 AS u
    FROM (
      SELECT g.step, g.id, g.par, g.deg, g.t0, g.t1, g.t2, g.asg,
             {h} AS h, {bs}
      FROM gibbs g
      LEFT JOIN (SELECT s.src AS id, {cnts}
                 FROM gsym s JOIN gibbs n ON n.id = s.dst
                 GROUP BY s.src) nb ON g.id = nb.id
      WHERE g.step < {nsteps}
    ) p
  ) q
)
SELECT id, asg FROM gibbs WHERE step = {nsteps}"""


# ---------------------------------------------------------------------------
# Implicit-rating injection (mirrors algos/als.py::add_implicit_ratings
# — implicit.hpp:40-88): rank-indexed dimension tables + edge_hash pair
# sampling replay the exact injected edge set; j comes from a
# row_number over lineitem x range(8) (DuckDB's range() takes constants
# only, so the domain is data-proportional: valid while toadd =
# pct*M*N <= 8|lineitem|, which at pct=1e-4 holds to TPC-H sf ~ 240 —
# far beyond the driver's sf0.01 gate; above that the oracle would
# under-inject and the row-count check would catch it loudly).
# ---------------------------------------------------------------------------


def sql_implicit_ratings(percentage: float, value: float = 0.0,
                         seed: int = 97) -> str:
    uh = f"({sql_edge_hash(str(seed), 'js.j')} % p.m)"
    ih = f"({sql_edge_hash(str(seed + 1), 'js.j')} % p.n)"
    return f"""
WITH {RATINGS_CTE},
uidx AS (SELECT u, row_number() OVER (ORDER BY u) - 1 AS idx
         FROM (SELECT DISTINCT u FROM ratings)),
iidx AS (SELECT it, row_number() OVER (ORDER BY it) - 1 AS idx
         FROM (SELECT DISTINCT it FROM ratings)),
p AS (SELECT (SELECT count(*) FROM uidx) AS m,
             (SELECT count(*) FROM iidx) AS n),
js AS (SELECT j FROM (
         SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber, r8)
                - 1 AS j
         FROM (SELECT l_orderkey, l_linenumber, r.range AS r8
               FROM lineitem CROSS JOIN range(8) r))
       WHERE j < (SELECT greatest(1, CAST(floor({percentage!r} * m * n)
                                          AS BIGINT)) FROM p)),
aidx AS (SELECT {uh} AS uq, {ih} AS iq FROM js CROSS JOIN p),
adds AS (
  SELECT u.u AS "user", i.it AS item, {value!r} AS rating
  FROM aidx a
  JOIN uidx u ON u.idx = a.uq
  JOIN iidx i ON i.idx = a.iq)
SELECT "user", item, round(rating, 6) AS rating FROM (
  SELECT u AS "user", it AS item, r AS rating FROM ratings
  UNION ALL SELECT * FROM adds)"""


# ---------------------------------------------------------------------------
# Sparse ALS at k=2, s=1 (mirrors algos/als.py::sparse_als with
# portable_init — sparse_als.cpp / cosamp.hpp): dense 2x2 Cramer solve,
# abs-argmax support pick, scalar re-solve on the chosen coordinate —
# the CoSaMP identify+re-estimate step is fully ANSI-expressible at
# this rank, closing the solve-family oracle gap left by the k x k
# LDLT (cf_als_factor_norms stays rows-only).
# ---------------------------------------------------------------------------


def sql_sparse_als2_user_factors(iterations: int = 2,
                                 reg: float = 0.01) -> str:
    init1 = sql_lcg_hash("b.id * 31 + 13")        # side=1, c=0
    init2 = sql_lcg_hash("b.id * 31 + 20")        # side=1, c=1
    det = "(a11*a22 - a12*a12)"
    project = f"""(SELECT id,
        CASE WHEN abs((b1*a22 - b2*a12) / {det})
                  >= abs((a11*b2 - a12*b1) / {det})
             THEN b1 / a11 ELSE 0.0 END AS v1,
        CASE WHEN abs((b1*a22 - b2*a12) / {det})
                  >= abs((a11*b2 - a12*b1) / {det})
             THEN 0.0 ELSE b2 / a22 END AS v2"""
    uv = f"""{project}
 FROM (SELECT r.u AS id,
              sum(q.v1*q.v1) + {reg!r} AS a11, sum(q.v1*q.v2) AS a12,
              sum(q.v2*q.v2) + {reg!r} AS a22,
              sum(r.r*q.v1) AS b1, sum(r.r*q.v2) AS b2
       FROM ratings r JOIN fac q ON q.side = 1 AND q.id = r.it
       GROUP BY r.u))"""
    iv = f"""{project}
 FROM (SELECT r.it AS id,
              sum(p.v1*p.v1) + {reg!r} AS a11, sum(p.v1*p.v2) AS a12,
              sum(p.v2*p.v2) + {reg!r} AS a22,
              sum(r.r*p.v1) AS b1, sum(r.r*p.v2) AS b2
       FROM ratings r JOIN {uv} p ON p.id = r.u
       GROUP BY r.it))"""
    return f"""
WITH RECURSIVE
{RATINGS_CTE},
fac(iter, side, id, v1, v2) AS (
  SELECT 0, 1, b.id, 0.1 * ({init1} / 2147483648.0),
               0.1 * ({init2} / 2147483648.0)
  FROM (SELECT DISTINCT it AS id FROM ratings) b
  UNION ALL
  SELECT * FROM (
    SELECT m.iter + 1 AS iter, 0 AS side, un.id, un.v1, un.v2
    FROM {uv} un CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
    UNION ALL
    SELECT m.iter + 1, 1, inew.id, inew.v1, inew.v2
    FROM {iv} inew CROSS JOIN (SELECT DISTINCT iter FROM fac) m
    WHERE m.iter < {iterations}
  )
)
SELECT id, round(v1, 6) AS v1, round(v2, 6) AS v2 FROM fac
WHERE side = 0 AND iter = (SELECT max(iter) FROM fac)"""


# ---------------------------------------------------------------------------
# Lanczos SVD at m=2 (mirrors algos/svd.py::lanczos_svd): the two
# Krylov steps are matvec/dot/normalize CTEs (including the full-
# reorthogonalization pass against q1, replayed even though its
# coefficient is ~1e-15 — the oracle mirrors the code's arithmetic,
# not the math), and the 2x2 symmetric tridiagonal eigenproblem has
# the closed form (a1+a2)/2 +- sqrt(((a1-a2)/2)^2 + b1^2); numpy's
# eigvalsh agrees to ulps, absorbed by round 6.  The m=4 path
# (cf_svd_lanczos) keeps its tridiagonal numpy eigensolve rows-only.
# ---------------------------------------------------------------------------


def sql_svd_lanczos2_sigma() -> str:
    return f"""
WITH {RATINGS_CTE},
items AS (SELECT DISTINCT it AS id FROM ratings),
q1 AS (SELECT id, 1.0 / sqrt((SELECT count(*) FROM items)) AS v
       FROM items),
y1 AS (SELECT r.u AS id, sum(r.r * q.v) AS v
       FROM ratings r JOIN q1 q ON q.id = r.it GROUP BY r.u),
w1 AS (SELECT r.it AS id, sum(r.r * y.v) AS v
       FROM ratings r JOIN y1 y ON y.id = r.u GROUP BY r.it),
a1 AS (SELECT sum(w.v * q.v) AS a FROM w1 w JOIN q1 q ON q.id = w.id),
wa AS (SELECT w.id, w.v - (SELECT a FROM a1) * coalesce(q.v, 0.0) AS v
       FROM w1 w LEFT JOIN q1 q ON q.id = w.id),
d1 AS (SELECT sum(w.v * q.v) AS d FROM wa w JOIN q1 q ON q.id = w.id),
wb AS (SELECT w.id, w.v - (SELECT d FROM d1) * coalesce(q.v, 0.0) AS v
       FROM wa w LEFT JOIN q1 q ON q.id = w.id),
b1 AS (SELECT sqrt(sum(v * v)) AS b FROM wb),
q2 AS (SELECT id, v / (SELECT b FROM b1) AS v FROM wb),
y2 AS (SELECT r.u AS id, sum(r.r * q.v) AS v
       FROM ratings r JOIN q2 q ON q.id = r.it GROUP BY r.u),
w2 AS (SELECT r.it AS id, sum(r.r * y.v) AS v
       FROM ratings r JOIN y2 y ON y.id = r.u GROUP BY r.it),
a2 AS (SELECT sum(w.v * q.v) AS a FROM w2 w JOIN q2 q ON q.id = w.id),
t AS (SELECT (SELECT a FROM a1) AS t11, (SELECT a FROM a2) AS t22,
             (SELECT b FROM b1) AS t12)
SELECT round(sqrt(greatest((t11 + t22) / 2.0
             + sqrt(((t11 - t22) / 2.0) * ((t11 - t22) / 2.0)
                    + t12 * t12), 0.0)), 6) AS sigma1,
       round(sqrt(greatest((t11 + t22) / 2.0
             - sqrt(((t11 - t22) / 2.0) * ((t11 - t22) / 2.0)
                    + t12 * t12), 0.0)), 6) AS sigma2
FROM t"""


# ---------------------------------------------------------------------------
# Computer-vision stitch match graph (mirrors functions/vision.py —
# stitch_main.cpp:137-162): chunk-hash keypoints, visual-word equi-join
# matching with a stop-feature df-cap, hash-min CC panorama grouping
# (the same _cc_rec recursion the graph CC oracle uses, fed the match
# edges).
# ---------------------------------------------------------------------------


def _vision_ctes() -> str:
    from .functions.vision import (sql_features, sql_images,
                                   sql_match_features)
    return (sql_images().strip() + ",\n" + sql_features().strip() + ",\n"
            + sql_match_features().strip())


def sql_vision_match_graph() -> str:
    return ("WITH " + _vision_ctes()
            + "\nSELECT img_a, img_b, matches FROM matches")


def sql_vision_panorama_groups() -> str:
    vverts = ("vverts AS (SELECT DISTINCT id FROM ("
              "SELECT img_a AS id FROM matches "
              "UNION ALL SELECT img_b FROM matches))")
    vsym = ("vsym AS (SELECT img_a AS src, img_b AS dst FROM matches "
            "UNION ALL SELECT img_b, img_a FROM matches)")
    return ("WITH RECURSIVE " + _vision_ctes() + ",\n"
            + vverts + ",\n" + vsym + ",\n"
            + _cc_rec("vcc", "vverts", "vsym")
            + "\nSELECT id, component AS pano FROM vcc "
              "WHERE iter = (SELECT max(iter) FROM vcc)")


def _vision_transform_ctes() -> str:
    """Shifted images -> content features -> pair transforms (mirrors
    the camera-estimation inputs of ``functions/vision.py``)."""
    from .functions.vision import (sql_content_features,
                                   sql_images_shifted,
                                   sql_pair_transforms)
    return (sql_images_shifted().strip() + ",\n"
            + sql_content_features().strip() + ",\n"
            + sql_pair_transforms().strip())


def sql_vision_pair_transforms() -> str:
    return ("WITH " + _vision_transform_ctes()
            + "\nSELECT img_a, img_b, n_matches, shift, n_inliers, "
              "confidence FROM transforms")


def sql_vision_camera_offsets(cap: int = 64) -> str:
    """Twin of ``vision.camera_offsets``: hash-min CC over the pair
    transforms for panorama roots, then a level-synchronous BFS
    recursion accumulating ``offset(dst) = offset(src) + shift`` with a
    min-merge on first reach, plus the truncation-sentinel chk of the
    Spark side's RuntimeError."""
    tverts = ("tverts AS (SELECT DISTINCT id FROM ("
              "SELECT img_a AS id FROM transforms "
              "UNION ALL SELECT img_b FROM transforms))")
    tsym = ("tsym AS (SELECT img_a AS src, img_b AS dst, shift AS t "
            "FROM transforms "
            "UNION ALL SELECT img_b, img_a, -shift FROM transforms)")
    tsympairs = ("tsympairs AS (SELECT src, dst FROM tsym)")
    panof = ("panof AS (SELECT id, component AS pano FROM tcc "
             "WHERE iter = (SELECT max(iter) FROM tcc))")
    off = f"""
off(iter, id, pano, ofs, dist, grew) AS (
  SELECT 0, id, pano, CAST(0 AS DOUBLE), 0, CAST(1 AS BIGINT)
  FROM panof WHERE id = pano
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, u.id, u.pano, u.ofs, u.dist,
           sum(CASE WHEN u.dist = p.iter + 1 THEN 1 ELSE 0 END)
             OVER () AS grew
    FROM (
      SELECT id, pano, ofs, dist FROM off
      UNION ALL
      SELECT nf.id, pn.pano, nf.ofs, nf.dist FROM (
        SELECT s.dst AS id, min(f.ofs + s.t) AS ofs,
               f.dist + 1 AS dist
        FROM off f JOIN tsym s ON f.id = s.src
        WHERE f.dist = f.iter
        GROUP BY s.dst, f.dist
      ) nf
      JOIN panof pn ON pn.id = nf.id
      LEFT JOIN off v ON v.id = nf.id
      WHERE v.id IS NULL
    ) u
    CROSS JOIN (SELECT DISTINCT iter, grew FROM off) p
    WHERE p.grew > 0 AND p.iter < {cap}
  )
)"""
    chk = f"""
chk AS (SELECT CASE WHEN max(iter) >= {cap}
                    AND max(CASE WHEN iter = (SELECT max(iter) FROM off)
                                 THEN grew ELSE 0 END) > 0
               THEN error('camera_offsets oracle BFS truncated at '
                          'cap={cap} with a growing frontier')
               ELSE 0 END AS ok FROM off)"""
    return ("WITH RECURSIVE " + _vision_transform_ctes() + ",\n"
            + tverts + ",\n" + tsym + ",\n" + tsympairs + ",\n"
            + _cc_rec("tcc", "tverts", "tsympairs") + ",\n"
            + panof + ",\n" + off.strip() + ",\n" + chk.strip() + """
SELECT o.id, o.pano, round(o.ofs, 6) AS "offset"
FROM off o CROSS JOIN chk
WHERE o.iter = (SELECT max(iter) FROM off) AND chk.ok = 0""")


def sql_vision_composite_stats(cap: int = 64) -> str:
    """Twin of ``vision.warp_images`` |> per-pano canvas stats (the
    stitch tail's coordinate plumbing): each matched image occupies
    ``[pos0, pos0 + len)`` root-frame bytes with
    ``pos0 = floor(-offset*CHUNK + 0.5)``; the composite canvas width
    is ``max(end) - min(pos0)``.  The camera-offsets recursion runs as
    a nested CTE; the outer ``images`` CTE re-derives payload lengths
    (ASCII corpus: char length == octet length, and non-ASCII images
    never produce features, so they cannot appear among the offsets)."""
    from .functions.vision import CHUNK, sql_images_shifted
    inner = sql_vision_camera_offsets(cap)
    return ("WITH " + sql_images_shifted().strip() + ",\n"
            + f"coff AS ({inner}),\n" + f"""
cwarp AS (
  SELECT c.pano,
         CAST(floor(-c."offset" * {CHUNK} + 0.5) AS BIGINT) AS pos0,
         CAST(length(i.payload) AS BIGINT) AS w
  FROM coff c JOIN images i ON i.img_id = c.id)
SELECT pano, CAST(count(*) AS BIGINT) AS n_images,
       CAST(max(pos0 + w) - min(pos0) AS BIGINT) AS width
FROM cwarp GROUP BY pano""")


# ---------------------------------------------------------------------------
# N-ary factor-graph max-sum BP (mirrors algos/factor_bp.py over the
# sources/parsers.py::load_synthetic_factor_graph model — the factors/
# library surface: bp_vertex_program.hpp + factor_graph.hpp).  The
# recursive CTE advances one synchronous message round per iteration
# over exploded (fid, vid, state) message rows; shift-normalizations
# are windows over (fid, vid), the factor-belief stride walk rides a
# precomputed assignment map.
# ---------------------------------------------------------------------------


def sql_factor_bp_beliefs(groups: int = 40, iterations: int = 5,
                          damping: float = 0.5,
                          regularization: float = 0.25,
                          seed: int = 41, mode: str = "max") -> str:
    g, alz = groups, "-1000000.0"
    d, r = repr(float(damping)), repr(float(regularization))
    u0 = _sql_synth_unit(sql_edge_hash(str(seed), "(v.vid * 8 + s.range)"))
    u1 = _sql_synth_unit(sql_edge_hash(str(seed + 1),
                                       "(fn.fid * 32 + e.range)"))
    statics = f"""
vars AS (
  SELECT i.range AS vid, CAST(2 + i.range % 2 AS INT) AS card
  FROM range({3 * g + 1}) i),
pri AS (
  SELECT v.vid, CAST(s.range AS INT) AS i, -(0.1 + 0.8 * {u0}) AS p
  FROM vars v, range(3) s WHERE s.range < v.card),
inc AS (
  SELECT t.range AS fid, t.range * 3 + p.range AS vid,
         CAST(p.range AS INT) AS pos
  FROM range({g}) t, range(3) p
  UNION ALL
  SELECT {g} + t.range,
         CASE WHEN p.range = 0 THEN t.range * 3 + 2
              ELSE t.range * 3 + 3 END, CAST(p.range AS INT)
  FROM range({g - 1}) t, range(2) p
  UNION ALL
  SELECT {2 * g} + t.range, t.range * 3, 0 FROM range({g}) t),
inc3 AS (
  SELECT i.fid, i.vid, i.pos, v.card,
         CAST(coalesce((SELECT product(v2.card)
                        FROM inc i2 JOIN vars v2 ON v2.vid = i2.vid
                        WHERE i2.fid = i.fid AND i2.pos < i.pos), 1.0)
              AS BIGINT) AS stride,
         CAST((SELECT product(v2.card)
               FROM inc i2 JOIN vars v2 ON v2.vid = i2.vid
               WHERE i2.fid = i.fid) AS BIGINT) AS numel
  FROM inc i JOIN vars v ON v.vid = i.vid),
fnum AS (SELECT fid, max(numel) AS numel FROM inc3 GROUP BY fid),
ftab AS (
  SELECT fn.fid, e.range AS idx, -(0.2 + 0.6 * {u1}) AS val
  FROM fnum fn, range(27) e WHERE e.range < fn.numel),
amap AS (
  SELECT i.fid, i.vid, i.pos, t.idx,
         CAST((t.idx // i.stride) % i.card AS INT) AS st
  FROM inc3 i JOIN ftab t ON t.fid = i.fid),
states AS (
  SELECT i.fid, i.vid, CAST(s.range AS INT) AS i
  FROM inc3 i, range(3) s WHERE s.range < i.card)"""
    # one synchronous round computed from the previous working table m
    reg_layers = f"""
      SELECT it, fid, vid, i, mv, mf,
             ln({r} * exp(1.0) + (1 - {r})
                * exp(rmv - max(rmv) OVER (PARTITION BY fid, vid))) AS rmv,
             ln({r} * exp(1.0) + (1 - {r})
                * exp(rmf - max(rmf) OVER (PARTITION BY fid, vid))) AS rmf
      FROM""" if regularization > 0.0 else """
      SELECT it, fid, vid, i, mv, mf, rmv, rmf
      FROM"""
    damp_mv = (f"CASE WHEN {d} * exp(mv) + (1 - {d}) * exp(smv) = 0 "
               f"THEN {alz} ELSE ln({d} * exp(mv) + (1 - {d}) * exp(smv)) "
               "END") if damping > 0.0 else "smv"
    damp_mf = (f"CASE WHEN {d} * exp(mf) + (1 - {d}) * exp(smf) = 0 "
               f"THEN {alz} ELSE ln({d} * exp(mf) + (1 - {d}) * exp(smf)) "
               "END") if damping > 0.0 else "smf"
    # factor->variable projection: MAP (max) or marginalize (sum) —
    # the sum arm mirrors Spark's per-entry exp(fb - mv) accumulation
    if mode == "max":
        agg = "max(f.fb) AS mxfb"
        m4join = ""
        proj = f"greatest({alz}, rf.mxfb - m.mv)"
    else:
        agg = "sum(exp(f.fb - m4.mv)) AS sumexp"
        m4join = ("\n            JOIN msgs m4 ON m4.fid = a.fid "
                  "AND m4.vid = a.vid AND m4.i = a.st")
        proj = (f"CASE WHEN rf.sumexp = 0 THEN {alz} "
                "ELSE ln(rf.sumexp) END")
    rec = f"""
msgs(it, fid, vid, i, mv, mf) AS (
  SELECT 0, fid, vid, i, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
  FROM states
  UNION ALL
  SELECT it, fid, vid, i, {damp_mv} AS mv, {damp_mf} AS mf
  FROM (
    SELECT it, fid, vid, i, mv, mf,
           rmv - max(rmv) OVER (PARTITION BY fid, vid) AS smv,
           rmf - max(rmf) OVER (PARTITION BY fid, vid) AS smf
    FROM ({reg_layers} (
      SELECT m.it + 1 AS it, m.fid, m.vid, m.i, m.mv, m.mf,
             vb.b - m.mf AS rmv,
             {proj} AS rmf
      FROM msgs m
      JOIN (SELECT p.vid, p.i, p.p + q.s AS b
            FROM pri p
            JOIN (SELECT vid, i, sum(mf) AS s FROM msgs
                  GROUP BY vid, i) q
              ON q.vid = p.vid AND q.i = p.i) vb
        ON vb.vid = m.vid AND vb.i = m.i
      JOIN (SELECT a.fid, a.vid, a.st, {agg}
            FROM amap a
            JOIN (SELECT t.fid, t.idx, t.val + sum(m3.mv) AS fb
                  FROM ftab t
                  JOIN amap a2 ON a2.fid = t.fid AND a2.idx = t.idx
                  JOIN msgs m3 ON m3.fid = a2.fid AND m3.vid = a2.vid
                                  AND m3.i = a2.st
                  GROUP BY t.fid, t.idx, t.val) f
              ON f.fid = a.fid AND f.idx = a.idx{m4join}
            GROUP BY a.fid, a.vid, a.st) rf
        ON rf.fid = m.fid AND rf.vid = m.vid AND rf.st = m.i
      WHERE m.it < {iterations}
    ) z0) z1
  ) z2
)"""
    return f"""
WITH RECURSIVE {statics.strip()},
{rec.strip()},
fin AS (SELECT vid, i, sum(mf) AS s FROM msgs
        WHERE it = {iterations} GROUP BY vid, i),
bel AS (SELECT p.vid, p.i,
               CASE WHEN f.s IS NULL THEN 0.0 ELSE p.p + f.s END AS b
        FROM pri p LEFT JOIN fin f ON f.vid = p.vid AND f.i = p.i)
-- label via a single-evaluation window, NOT a b = max(b) re-join:
-- DuckDB inlines the bel CTE into each reference and the parallel
-- float aggregation inside can differ in the last ulp between
-- evaluations, so exact-equality argmax joins drop whole variables
SELECT vid AS id, i, round(b, 6) AS b,
       first_value(i) OVER (PARTITION BY vid ORDER BY b DESC, i ASC)
         AS label
FROM bel"""


# ---------------------------------------------------------------------------
# betweenness / harmonic centrality (mirror algos/betweenness.py —
# multi-root level-synchronous BFS with path counting, then for
# betweenness a descending-level dependency accumulation over the
# shortest-path DAG)
# ---------------------------------------------------------------------------

_SYMD = "symd AS (SELECT DISTINCT src, dst FROM sym)"


def _brandes_bfs_rec(roots: tuple[int, ...], cap: int) -> str:
    """BFS recursion shared by the betweenness and harmonic oracles:
    re-emits the visited set each level and appends the new frontier
    (dist = iter) with sigma = sum of frontier-predecessor sigmas.
    Dense and frontier schedules agree because BFS level-synchrony
    fixes (dist, sigma) the first time a vertex is reached."""
    rootlist = ", ".join(str(int(r)) for r in roots)
    return f"""
bfs(iter, root, id, dist, sigma, grew) AS (
  SELECT 0, id, id, 0, CAST(1 AS DOUBLE), CAST(1 AS BIGINT)
  FROM verts WHERE id IN ({rootlist})
  UNION ALL
  SELECT * FROM (
    SELECT p.iter + 1 AS iter, u.root, u.id, u.dist, u.sigma,
           sum(CASE WHEN u.dist = p.iter + 1 THEN 1 ELSE 0 END)
             OVER () AS grew
    FROM (
      SELECT root, id, dist, sigma FROM bfs
      UNION ALL
      SELECT nf.root, nf.id, nf.dist, nf.sigma FROM (
        SELECT f.root, s.dst AS id, f.dist + 1 AS dist,
               sum(f.sigma) AS sigma
        FROM bfs f JOIN symd s ON f.id = s.src
        WHERE f.dist = f.iter
        GROUP BY f.root, s.dst, f.dist
      ) nf
      LEFT JOIN bfs v ON v.root = nf.root AND v.id = nf.id
      WHERE v.id IS NULL
    ) u
    CROSS JOIN (SELECT DISTINCT iter, grew FROM bfs) p
    WHERE p.grew > 0 AND p.iter < {cap}
  )
)"""


def _bfs_trunc_chk(cap: int) -> str:
    """One-row CTE that errors when the BFS recursion stopped at the
    iteration cap while the frontier was still growing — the oracle
    twin of the Spark side's RuntimeError, so a capped oracle run can
    never be mistaken for a valid baseline (it would silently
    undercount centralities otherwise).  Joined with ``WHERE ok = 0``
    so the check cannot be pruned as unused."""
    return f"""
chk AS (SELECT CASE WHEN max(iter) >= {cap}
                    AND max(CASE WHEN iter = (SELECT max(iter) FROM bfs)
                                 THEN grew ELSE 0 END) > 0
               THEN error('oracle BFS truncated at cap={cap} with a '
                          'growing frontier; raise cap above the graph '
                          'diameter')
               ELSE 0 END AS ok FROM bfs)"""


def sql_betweenness_hubs(roots: tuple[int, ...] = (-1, -2, -3, -4),
                         cap: int = 64) -> str:
    """Chained recursions: the shared ``bfs`` (``_brandes_bfs_rec``),
    then ``acc`` walking levels back down, computing
    delta(v) = sum_w sv/sw * (1 + delta(w)) from the already-final
    deltas one level deeper."""
    acc = """
fin AS (SELECT root, id, dist, sigma FROM bfs
        WHERE iter = (SELECT max(iter) FROM bfs)),
md AS (SELECT coalesce(max(dist), 0) AS d FROM fin),
dag AS (SELECT v.root, v.id AS v, w.id AS w, v.dist AS dv,
               v.sigma AS sv, w.sigma AS sw
        FROM fin v JOIN symd s ON v.id = s.src
        JOIN fin w ON w.root = v.root AND w.id = s.dst
                   AND w.dist = v.dist + 1),
acc(level, root, id, delta) AS (
  SELECT (SELECT d FROM md), root, id, CAST(0 AS DOUBLE)
  FROM fin WHERE dist = (SELECT d FROM md)
  UNION ALL
  SELECT * FROM (
    SELECT p.level - 1 AS level, u.root, u.id, u.delta
    FROM (
      SELECT root, id, delta FROM acc
      UNION ALL
      SELECT f.root, f.id, coalesce(c.contrib, CAST(0 AS DOUBLE))
      FROM fin f
      LEFT JOIN (
        SELECT g.root, g.v, sum(g.sv / g.sw * (1 + a.delta)) AS contrib
        FROM dag g JOIN acc a ON a.root = g.root AND a.id = g.w
        GROUP BY g.root, g.v
      ) c ON c.root = f.root AND c.v = f.id
      WHERE f.dist = (SELECT DISTINCT level FROM acc) - 1
    ) u
    CROSS JOIN (SELECT DISTINCT level FROM acc) p
    WHERE p.level > 0
  )
)"""
    return (_rec(_VERTS, _SYM, _SYMD,
                 _brandes_bfs_rec(roots, cap).strip(), acc.strip(),
                 _bfs_trunc_chk(cap).strip()) + """
SELECT v.id, round(coalesce(s.bcsum, 0), 6) AS bc
FROM verts v CROSS JOIN chk LEFT JOIN (
  SELECT id, sum(delta) AS bcsum FROM acc
  WHERE level = (SELECT min(level) FROM acc) AND root <> id
  GROUP BY id) s ON s.id = v.id
WHERE chk.ok = 0""")


def sql_harmonic_hubs(roots: tuple[int, ...] = (-1, -2, -3, -4),
                      cap: int = 64) -> str:
    """Harmonic centrality over the source set: sum of 1/dist over the
    final BFS table's positive-distance rows (the root's own dist-0 row
    and unreached vertices contribute nothing)."""
    fin = """
fin AS (SELECT root, id, dist FROM bfs
        WHERE iter = (SELECT max(iter) FROM bfs))"""
    return (_rec(_VERTS, _SYM, _SYMD,
                 _brandes_bfs_rec(roots, cap).strip(), fin.strip(),
                 _bfs_trunc_chk(cap).strip()) + """
SELECT v.id, round(coalesce(s.hcsum, 0), 6) AS hc
FROM verts v CROSS JOIN chk LEFT JOIN (
  SELECT id, sum(CAST(1 AS DOUBLE) / dist) AS hcsum FROM fin
  WHERE dist > 0 GROUP BY id) s ON s.id = v.id
WHERE chk.ok = 0""")
