"""Loopy belief propagation (graphical-models toolkit).

Reference:
``/root/reference/toolkits/graphical_models/lbp_structured_prediction.cpp:282``
— synchronous sum-product message passing on a pairwise MRF: each
directed edge (u, v) carries a message vector, gather multiplies the
incoming messages (the product-over-factors shape no other implemented
algorithm exercises), apply/scatter renormalizes and emits updated
messages; node beliefs are potential x message-product, normalized.

This engine's instance: binary states over the link graph, node
potentials seeded from the portable LCG (so the DuckDB oracle replays
them — ``oracles.sql_lbp_beliefs``), Potts-style smoothing edge
potential.  Messages live in LOG domain: a hub vertex multiplies tens
of thousands of (<1) messages, which underflows linear-domain doubles
— cavity products become log-sums with a max-shift before exp
(vectorized column expressions, no UDFs).

Update per superstep (all edges simultaneously — the synchronous
schedule of the reference):

    lp(u, x)       = sum over incoming messages of lm(w->u, x)
    cavity(u->v,x) = lp(u, x) - lm(v->u, x)
    m'(u->v, y) ∝ sum_x phi_u(x) * psi(x, y) * exp(cavity - max_x)
    belief(v, x) ∝ phi_v(x) * exp(lp(v, x) - max_x)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..operators.portable import lcg_hash
from ..plans.checkpoint import truncate_lineage

# Potts smoothing potential psi[x][y]
PSI = ((0.7, 0.3), (0.3, 0.7))


def node_potentials(vertices: DataFrame) -> DataFrame:
    """(id, phi0, phi1): phi1 = 0.3 + 0.4*lcg_unit(id) — positive,
    normalized, engine-portable."""
    u = lcg_hash(F.col("id")) / F.lit(2.0 ** 31)
    phi1 = F.lit(0.3) + F.lit(0.4) * u
    return vertices.select(
        "id", (F.lit(1.0) - phi1).alias("phi0"), phi1.alias("phi1"))


def lbp_beliefs(graph: EdgeGraph, iterations: int = 5) -> DataFrame:
    """(id, b1): marginal belief of state 1 after ``iterations``
    synchronous sum-product sweeps (b0 = 1 - b1)."""
    sym = graph.symmetric_edges.select("src", "dst").distinct().persist()
    phi_cache = node_potentials(graph.vertices).persist()
    phi = truncate_lineage(phi_cache)
    phi_cache.unpersist()
    lm_init = math.log(0.5)
    msgs = sym.select(
        "src", "dst", F.lit(lm_init).alias("lm0"), F.lit(lm_init).alias("lm1"))
    msgs = truncate_lineage(msgs)
    for _ in range(iterations):
        lp = msgs.groupBy(F.col("dst").alias("id")).agg(
            F.sum("lm0").alias("lp0"), F.sum("lm1").alias("lp1"))
        rev = msgs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.col("lm0").alias("rl0"), F.col("lm1").alias("rl1"))
        lc0 = F.col("lp0") - F.col("rl0")
        lc1 = F.col("lp1") - F.col("rl1")
        mx = F.greatest(lc0, lc1)
        s0 = F.col("phi0") * F.exp(lc0 - mx)
        s1 = F.col("phi1") * F.exp(lc1 - mx)
        m0 = s0 * PSI[0][0] + s1 * PSI[1][0]
        m1 = s0 * PSI[0][1] + s1 * PSI[1][1]
        t = m0 + m1
        new_msgs = (
            sym.join(lp.withColumnRenamed("id", "src"), "src")
            .join(rev, ["src", "dst"])
            .join(phi.withColumnRenamed("id", "src"), "src")
            .select("src", "dst",
                    F.log(m0 / t).alias("lm0"), F.log(m1 / t).alias("lm1"))
        )
        cached = new_msgs.persist()
        nxt = truncate_lineage(cached)
        cached.unpersist()
        msgs.unpersist()
        msgs = nxt
    lp = msgs.groupBy(F.col("dst").alias("id")).agg(
        F.sum("lm0").alias("lp0"), F.sum("lm1").alias("lp1"))
    mx = F.greatest(F.col("lp0"), F.col("lp1"))
    b0 = F.col("phi0") * F.exp(F.col("lp0") - mx)
    b1 = F.col("phi1") * F.exp(F.col("lp1") - mx)
    out = (
        phi.join(lp, "id")
        .select("id", (b1 / (b0 + b1)).alias("b1"))
    )
    sym.unpersist()
    return out
