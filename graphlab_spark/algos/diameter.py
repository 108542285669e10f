"""Approximate diameter via Flajolet–Martin neighborhood function.

Parity contract
(``/root/reference/toolkits/graph_analytics/approximate_diameter.cpp``):

- each vertex keeps K FM bitmasks (default 10, ``:48-53``; we default to
  8 for long-packing); init sets one geometrically-sampled bit per mask
  (``:82-107``); here the bit is drawn from a deterministic seeded hash
  so runs are reproducible at any parallelism;
- each superstep ORs neighbor masks over OUT edges (double-buffered
  odd/even copies in the reference, ``:133-165`` — Spark's immutable
  DataFrames make the double-buffering implicit);
- the driver stops when the estimated reached-pair count stops growing
  (``:193-228``); the superstep count at that point approximates the
  (effective) diameter.

Spark plan: the K masks are K plain LONG columns aggregated with the
native ``bit_or`` — whole-stage-codegen-friendly, no arrays, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import EdgeGraph


def _fm_bit(id_col, replica: int):
    """Geometric bit index in [0,63] from a deterministic hash."""
    h = F.xxhash64(id_col, F.lit(replica), F.lit(0xD1A))
    # count trailing zeros of the hash (geometric with p=1/2), capped at 62
    bits = F.conv(F.abs(h).cast("string"), 10, 2)
    tz = F.length(bits) - F.length(F.regexp_replace(bits, "0+$", ""))
    # 2^tz as a long; F.pow is exact for powers of two and, unlike
    # F.shiftleft, accepts a Column shift amount
    return F.pow(F.lit(2.0), F.least(tz, F.lit(62))).cast("long")


def approx_diameter(
    graph: EdgeGraph, n_masks: int = 8, max_supersteps: int = 64, verbose: bool = False
) -> dict:
    """Returns {'diameter': int, 'history': [estimated pair counts]}."""
    mask_cols = [f"bm{i}" for i in range(n_masks)]
    state = graph.vertices.select(
        "id", *[_fm_bit(F.col("id"), i).alias(c) for i, c in enumerate(mask_cols)]
    ).persist()
    edges = graph.edges.select("src", "dst")

    def estimate(df) -> float:
        # FM estimate per vertex: 2^b / 0.77351 with b = index of lowest
        # zero bit, averaged over masks; we sum over vertices.
        ests = [
            F.pow(F.lit(2.0), _lowest_zero_bit(F.col(c))) for c in mask_cols
        ]
        per_vertex = sum(ests) / (n_masks * 0.77351)
        return df.agg(F.sum(per_vertex)).first()[0]

    history = [estimate(state)]
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
        ).localCheckpoint(eager=True)
        state.unpersist()
        state = new_state
        est = estimate(state)
        history.append(est)
        if verbose:
            print(f"[diameter superstep {it}] reached-pairs≈{est:.1f}")
        if est <= history[-2] * 1.0001:
            diameter = it
            break
        diameter = it
    return {"diameter": diameter, "history": history}


def _lowest_zero_bit(mask_col):
    """Index of the lowest 0 bit of a long bitmask (vectorized)."""
    # lowest zero bit of m == lowest set bit of ~m; log2 of (x & -x).
    inv = F.bitwise_not(mask_col)
    low = inv.bitwiseAND(-inv)
    return F.log2(F.abs(low.cast("double")))
