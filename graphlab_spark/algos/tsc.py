"""Total Subgraph Communicability (fork-specific research toolkit).

Reference: ``/root/reference/toolkits/graph_analytics/TSC.cpp`` — the
nddsg fork's own research code: ``TSC(G) = exp(A) * b`` with
``b = ones`` (header derivation, ``TSC.cpp:19-45``), approximated by
the Arnoldi process of Saad (1992): build an orthonormal Krylov basis
``V`` and the small Hessenberg ``H`` with

    w = A * V[j];  H[i,j] = (w, V[i]);  w -= H[i,j] V[i]
    H[j+1,j] = ||w||;  V[j+1] = w / ||w||          (``:268-283``)

then ``exp(A) b ~= beta * V exp(H) e1`` with ``beta = ||b||``,
stopping when successive approximations stop changing or H breaks
down (``:286-306``).  The matvec gathers over IN edges
(``AVj_to_w``, ``:117-131``): ``w(v) = sum over edges (u, v) of
V(u)`` — the directed adjacency transpose; pass ``column=i`` to get
column i of ``exp(A)`` instead of the row-sum (``:156-163``).

Deviation noted: the reference initializes the TSC-mode basis with
``w = 1/sqrt(m)`` and ``beta = sqrt(m)`` (m = Krylov budget,
``:167-171, 251``) and pushes that first column unnormalized; the
derivation in its own header wants ``b/||b||`` with
``beta = ||b|| = sqrt(n)``.  We implement the header's (Saad's)
formulation — for ``m != n`` the reference's constant is a bug, not a
semantic.

Plan shape: state is ``(id, v)`` with ``v`` an ``array<double>``
Krylov column stack.  Per Arnoldi step: one edge⋈state matvec
(shuffle on dst), one aggregation computing ALL j+1 inner products in
a single pass (``sum(w * v[i])`` per i — map-side partial
aggregation), one column-expression orthogonalization with the
driver-held H entries, one norm aggregate.  ``exp(H)`` is an
(m+1)x(m+1) dense driver-side matrix — scaling-and-squaring Taylor,
no SciPy dependency.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..plans.checkpoint import truncate_lineage


def _expm(h: np.ndarray) -> np.ndarray:
    """Dense matrix exponential by scaling-and-squaring + Taylor —
    adequate for the small (m+1)x(m+1) Hessenberg blocks here."""
    nrm = float(np.linalg.norm(h, 1))
    s = max(0, int(math.ceil(math.log2(max(nrm, 1e-300)))) + 1)
    a = h / (2.0 ** s)
    out = np.eye(h.shape[0])
    term = np.eye(h.shape[0])
    for k in range(1, 30):
        term = term @ a / k
        out = out + term
    for _ in range(s):
        out = out @ out
    return out


def tsc(graph: EdgeGraph, m: int = 12, column: int | None = None,
        tol: float = 1e-15) -> DataFrame:
    """(id, tsc): total subgraph communicability of every vertex
    (or column ``column`` of ``exp(A)`` when given), Krylov budget m.
    """
    edges = graph.edges.select("src", "dst").persist()
    verts = graph.vertices.persist()
    n = verts.count()
    m = min(m, n)
    if column is None:
        beta = math.sqrt(float(n))
        v0 = F.lit(1.0 / beta)
    else:
        beta = 1.0
        v0 = F.when(F.col("id") == column, 1.0).otherwise(0.0)
    state = verts.select("id", F.array(v0.cast("double")).alias("v"))
    state = truncate_lineage(state)

    h = np.zeros((m + 1, m + 1))
    prev_hleft: np.ndarray | None = None
    hleft = np.zeros(1)
    for j in range(m):
        # w(v) = sum over in-edges (u, v) of V_j(u)  (TSC.cpp:117-131)
        last = F.element_at("v", j + 1)
        w = (
            edges.join(state.select(F.col("id").alias("src"),
                                    last.alias("x")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("w"))
        )
        ws = state.join(w, "id", "left").select(
            "id", "v", F.coalesce("w", F.lit(0.0)).alias("w"))
        ws = truncate_lineage(ws)
        # all inner products H[i,j] in one aggregation pass
        dots = ws.agg(*[
            F.sum(F.col("w") * F.element_at("v", i + 1)).alias(f"d{i}")
            for i in range(j + 1)
        ]).first()
        for i in range(j + 1):
            h[i, j] = float(dots[f"d{i}"])
        # orthogonalize, then norm (exact two-pass, as the reference)
        ortho = F.col("w") - sum(
            (F.lit(h[i, j]) * F.element_at("v", i + 1) for i in range(j + 1)),
            start=F.lit(0.0))
        ws2 = ws.select("id", "v", ortho.alias("w"))
        ws2 = truncate_lineage(ws2)
        ws.unpersist()
        nrm2 = ws2.agg(F.sum(F.col("w") ** 2).alias("s")).first()["s"]
        hnext = math.sqrt(max(float(nrm2), 0.0))
        h[j + 1, j] = hnext
        if hnext > tol:
            nxt = ws2.select(
                "id", F.concat("v", F.array(F.col("w") / hnext)).alias("v"))
            nxt = truncate_lineage(nxt)
            state.unpersist()
            ws2.unpersist()
            state = nxt
        else:
            ws2.unpersist()
        # convergence of successive exp(H) approximations (driver-side:
        # the basis is fixed, only the Hleft coefficients move)
        eh = _expm(h[: j + 2, : j + 2])
        hleft = beta * eh[: j + 1, 0]
        if prev_hleft is not None:
            a = np.zeros(j + 1)
            a[: len(prev_hleft)] = prev_hleft
            rel = np.max(np.abs(hleft - a) / (1e-15 + np.abs(hleft)))
            if rel < tol:
                break
        prev_hleft = hleft
        if hnext <= tol:
            break

    expr = sum(
        (F.lit(float(hleft[i])) * F.element_at("v", i + 1)
         for i in range(len(hleft))),
        start=F.lit(0.0))
    out = state.select("id", expr.alias("tsc"))
    edges.unpersist()
    verts.unpersist()
    return out
