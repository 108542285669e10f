"""Spectral pipeline: normalized Laplacian -> embedding -> k-means.

Reference parity:

- ``toolkits/graph_analytics/graph_laplacian.cpp:83-122`` — per-edge
  D^-1/2 normalization of the undirected adjacency (pure column work
  here: one degree join per side, no iteration);
- ``toolkits/clustering/spectral_clustering.cpp`` — the shell pipeline
  laplacian -> eigenvectors -> (row-normalize) -> k-means, re-expressed
  as: deflated power iteration on N = D^-1/2 A D^-1/2 for the 2nd
  eigenvector (the leading one is analytically sqrt(deg) — no solve
  needed), then ``algos.kmeans`` on the embedding;
- ``toolkits/clustering/eigen_vector_normalization.cpp`` — the
  row-normalization step (trivial for a 1-D embedding: sign).

The power iteration is deterministic (portable LCG init, fixed
iteration count), so the whole embedding is replayable by the DuckDB
oracle (``oracles.sql_spectral_embedding``).  Per iteration: one
edge⋈state join + two global sums that share a single driver action.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import EdgeGraph
from ..operators.portable import lcg_hash
from ..plans.checkpoint import truncate_lineage


def undirected_degrees(graph: EdgeGraph) -> DataFrame:
    """(id, deg): distinct-neighbor degree of the undirected view."""
    und = graph.symmetric_edges.select("src", "dst").distinct()
    return und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg"))


def normalized_adjacency(graph: EdgeGraph) -> DataFrame:
    """(src, dst, w): entries of N = D^-1/2 A D^-1/2 over the distinct
    undirected edge set — the reference's graph_laplacian output
    (L = I - N has the same off-diagonal entries negated)."""
    und = graph.symmetric_edges.select("src", "dst").distinct()
    deg = undirected_degrees(graph)
    return (
        und.join(deg.withColumnRenamed("id", "src")
                 .withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("id", "dst")
              .withColumnRenamed("deg", "dd"), "dst")
        .select("src", "dst",
                (F.lit(1.0) / F.sqrt(F.col("ds") * F.col("dd"))).alias("w"))
    )


def spectral_embedding(graph: EdgeGraph, iterations: int = 15) -> DataFrame:
    """(id, comp): 2nd eigenvector of N by power iteration deflated
    against the analytic leading eigenvector v1 = sqrt(deg)/||.||."""
    nadj = normalized_adjacency(graph).persist()
    deg = undirected_degrees(graph).persist()
    total = deg.agg(F.sum("deg")).first()[0]
    v1 = deg.select(
        "id", (F.sqrt("deg") / F.lit(math.sqrt(float(total)))).alias("v1"))
    v1 = truncate_lineage(v1)
    x = v1.select(
        "id",
        ((lcg_hash(F.col("id")) / F.lit(2.0 ** 31)) - F.lit(0.5)).alias("xv"))
    for _ in range(iterations):
        y = (
            nadj.join(x.withColumnRenamed("id", "src")
                      .withColumnRenamed("xv", "sx"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("w") * F.col("sx")).alias("yv"))
        )
        j = v1.join(y, "id", "left").select(
            "id", "v1", F.coalesce("yv", F.lit(0.0)).alias("yv"))
        row = j.agg(
            F.sum(F.col("v1") * F.col("yv")).alias("s1"),
            F.sum(F.col("yv") ** 2).alias("sy2"),
        ).first()
        s1, sy2 = float(row["s1"]), float(row["sy2"])
        # ||y - s1 v1||^2 = ||y||^2 - s1^2   (v1 is unit)
        nrm = math.sqrt(max(sy2 - s1 * s1, 1e-300))
        xc = j.select(
            "id",
            ((F.col("yv") - F.lit(s1) * F.col("v1")) / F.lit(nrm)).alias("xv"),
        ).persist()
        x = truncate_lineage(xc)
        xc.unpersist()
    nadj.unpersist()
    deg.unpersist()
    return x.select("id", F.col("xv").alias("comp"))


def spectral_clusters(graph: EdgeGraph, k: int = 2,
                      iterations: int = 15) -> DataFrame:
    """(id, cluster): k-means over the 1-D spectral embedding — the
    reference pipeline's final step (kmeans.cpp via spectral shell)."""
    from .kmeans import kmeans
    emb = spectral_embedding(graph, iterations).select(
        "id", F.array(F.col("comp")).alias("embedding"))
    assign, _ = kmeans(emb, k=k, id_col="id", vec_col="embedding",
                       init="first")
    return assign.withColumnRenamed("id", "id")
