"""Approximate diameter via Flajolet–Martin neighborhood function.

Parity contract
(``/root/reference/toolkits/graph_analytics/approximate_diameter.cpp``):

- each vertex keeps K FM bitmasks (default 10, ``:48-53``; we default to
  8 for long-packing); init sets one geometrically-sampled bit per mask
  (``:82-107``); here the bit index comes from a deterministic LCG value
  compared against geometric thresholds — pure BIGINT comparisons, so
  runs reproduce at any parallelism AND the exact computation can be
  replayed by an ANSI-SQL oracle (``oracles.sql_approx_diameter``);
- each superstep ORs neighbor masks along edges (double-buffered
  odd/even copies in the reference, ``:133-165`` — Spark's immutable
  DataFrames make the double-buffering implicit);
- the driver stops when the estimated reached-pair count stops growing
  (``:193-228``); the superstep count at that point approximates the
  (effective) diameter.

Spark plan: the K masks are K plain LONG columns aggregated with the
native ``bit_or`` — whole-stage-codegen-friendly, no arrays, no UDFs.
The reached-pair estimate rides the state materialization via
``df.observe`` (one Spark job per superstep, like the other iterative
algos), and the per-mask FM estimate ``2^lowest_zero_bit`` is the pure
integer expression ``(~m) & -(~m)`` — no string/regexp round-trips.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage

# Engine-portable mixed geometry (SQL twin: oracles._fm_ladder_sql).
from ..operators.portable import M as _M
from ..operators.portable import mix31 as _mix31

_REPLICA_STRIDE = 1_000_003


def _fm_bit(id_col, replica: int):
    """Geometric mask bit (P(bit j) = 2^-(j+1), capped at j=31) from a
    deterministic multiply-xor-shift mix, assigned by integer threshold
    comparisons — exactly portable to the SQL oracle."""
    seed = ((id_col % _M + _M) % _M + replica * _REPLICA_STRIDE) % _M
    k = _mix31(seed)
    expr = F.lit(1 << 31).cast("long")
    for j in range(30, -1, -1):
        expr = F.when(k < F.lit(_M - (_M >> (j + 1))),
                      F.lit(1 << j).cast("long")).otherwise(expr)
    return expr


def _lowest_zero_value(mask_col):
    """2^(index of the lowest 0 bit) of a long bitmask — the lowest SET
    bit of the complement, as a pure integer expression."""
    inv = F.bitwise_not(mask_col)
    return inv.bitwiseAND(-inv)


def approx_diameter(
    graph: EdgeGraph, n_masks: int = 8, max_supersteps: int = 64,
    direction: str = "out", verbose: bool = False
) -> dict:
    """Returns {'diameter': int, 'history': [estimated pair counts]}.

    ``direction``: 'out' gathers along directed edges (the reference
    default); 'all' uses the symmetric view — the effective-diameter
    question most callers mean on a directed log-derived graph, and
    the one whose growth actually stalls instead of crawling down
    per-user event chains."""
    mask_cols = [f"bm{i}" for i in range(n_masks)]
    state = graph.vertices.select(
        "id", *[_fm_bit(F.col("id"), i).alias(c) for i, c in enumerate(mask_cols)]
    ).persist()
    edges = (graph.symmetric_edges if direction == "all" else graph.edges
             ).select("src", "dst")

    def est_expr():
        per_vertex = sum(
            _lowest_zero_value(F.col(c)).cast("double") for c in mask_cols
        ) / (n_masks * 0.77351)
        return F.sum(per_vertex).alias("est")

    history = [float(state.agg(est_expr()).first()[0])]
    diameter = 0
    for it in range(1, max_supersteps + 1):
        nbr = (
            edges.join(state, edges["src"] == state["id"])
            .groupBy("dst")
            .agg(*[F.bit_or(c).alias(c) for c in mask_cols])
        )
        joined = state.join(nbr, state["id"] == nbr["dst"], "left")
        new_state = joined.select(
            state["id"],
            *[
                state[c].bitwiseOR(F.coalesce(nbr[c], F.lit(0))).alias(c)
                for c in mask_cols
            ],
        )
        from pyspark.sql import Observation
        obs = Observation(f"diameter_{it}")
        cached = new_state.observe(obs, est_expr()).persist()
        checkpointed = truncate_lineage(cached)  # materializes; fills obs
        cached.unpersist()
        state.unpersist()
        state = checkpointed
        est = float(obs.get["est"])
        history.append(est)
        if verbose:
            print(f"[diameter superstep {it}] reached-pairs≈{est:.1f}")
        if est <= history[-2] * 1.0001:
            diameter = it
            break
        diameter = it
    state.unpersist()
    return {"diameter": diameter, "history": history}
