"""Arrow-batched CSR-block gather — the vectorized-UDF superstep path.

The expression path (``algos/pagerank.py`` etc.) keeps the whole
superstep in Catalyst: join + whole-stage-codegen aggregate.  That is
the right default — but it only covers monoids expressible as built-in
aggregates.  This module is the engine's second gather implementation,
for monoids that need custom vectorized math, and it realizes the
vertex-cut locality design Spark-natively:

- the edge table is hash-partitioned into ``n_blocks`` by ``src`` and
  each block is sorted by ``src`` — a CSR-like adjacency block (row-
  sorted edge ranges per source vertex) delivered to Python as one
  Arrow batch per block;
- vertex state is co-grouped by the same hash, so each task receives
  exactly the state rows its block's sources need (the master→mirror
  shuffle of the reference, ``synchronous_engine.hpp:1796-1806``);
- the per-block kernel is vectorized pandas/numpy over the Arrow batch
  (merge on the sorted src ranges + grouped reduction) — no per-row
  Python anywhere;
- block-level partial results are then reduced per destination by a
  native hash aggregate (the reference's partial-gather-then-master
  merge, ``synchronous_engine.hpp:1563-1663``).

Reference analogs: local CSR storage built by counting sort
(``src/graphlab/graph/local_graph.hpp:54,209-240``), per-replica
partial gathers merged at the master.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_KEY = "__block"

# kernel(edges_block, state_block) -> partial messages DataFrame; both
# inputs are pandas frames backed by one Arrow batch
Kernel = Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame]


def csr_blocks(edges: DataFrame, n_blocks: int) -> DataFrame:
    """Edge table keyed into CSR-like blocks: hash(src) % n_blocks, and
    sorted by src inside each physical partition so every Arrow batch a
    kernel receives is a contiguous row-sorted adjacency range."""
    keyed = edges.withColumn(
        BLOCK_KEY, F.pmod(F.xxhash64("src"), F.lit(n_blocks)).cast("int"))
    return keyed.repartition(n_blocks, BLOCK_KEY).sortWithinPartitions(
        BLOCK_KEY, "src")


def arrow_gather(
    edge_blocks: DataFrame,
    state: DataFrame,
    kernel: Kernel,
    out_schema: str,
    n_blocks: int,
) -> DataFrame:
    """One gather superstep over CSR blocks.

    ``edge_blocks`` must come from :func:`csr_blocks` (carries
    ``__block``); ``state`` is any ``(id, ...)`` DataFrame.  The kernel
    runs once per block with the block's edges and exactly the state
    rows whose ids hash into the block.
    """
    skeyed = state.withColumn(
        BLOCK_KEY, F.pmod(F.xxhash64("id"), F.lit(n_blocks)).cast("int"))

    out_cols = [c.strip().split(" ")[0] for c in out_schema.split(",")]

    def run(edf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if len(edf) == 0 or len(sdf) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        return kernel(edf.drop(columns=[BLOCK_KEY]),
                      sdf.drop(columns=[BLOCK_KEY]))

    return (
        edge_blocks.groupBy(BLOCK_KEY)
        .cogroup(skeyed.groupBy(BLOCK_KEY))
        .applyInPandas(lambda e, s: run(e, s), schema=out_schema)
    )


def weighted_sum_kernel(edf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
    """PageRank's gather monoid as a vectorized kernel: messages =
    rank(src) * cw summed per dst within the block (block-level partial;
    the caller's hash aggregate finishes the reduction)."""
    m = edf.merge(sdf.rename(columns={"id": "src"}), on="src", how="inner")
    m["m"] = m["rank"] * m["cw"]
    return m.groupby("dst", as_index=False)["m"].sum()


def min_plus_kernel(edf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
    """SSSP's relax monoid as a vectorized kernel: candidate =
    distance(src) + edge weight, min-reduced per dst within the block
    (block-level partial; the caller's min aggregate finishes it) —
    the tropical-semiring twin of :func:`weighted_sum_kernel`, proving
    the CSR-block path is monoid-generic."""
    m = edf.merge(sdf.rename(columns={"id": "src"}), on="src", how="inner")
    m["m"] = m["distance"] + m["__w"]
    return m.groupby("dst", as_index=False)["m"].min()
