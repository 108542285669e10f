"""Hub-vertex salting: two-level aggregation for skewed keys.

Power-law hubs are the reason the reference uses vertex-cuts
(``distributed_graph.hpp:263-266``): a hub's gather is computed as
per-machine partials merged at the master
(``synchronous_engine.hpp:1563-1663``). Spark's hash aggregate already
does partial (map-side) + final aggregation, which covers algebraic
monoids (sum/min/count). Salting matters for the cases partial
aggregation does NOT fully solve:

- joins keyed on a skewed column (all of a hub's edges land in one
  shuffle partition) — AQE skew-join splitting handles the sort-merge
  path; for the hash path we salt explicitly;
- high-cardinality composite aggregations (e.g. LPA's per-(dst,label)
  counts when a hub sees millions of distinct labels).

``salted_agg`` splits each row's key with a random-ish but deterministic
salt (hash of all columns), aggregates per (key, salt), then re-aggregates
per key. Correct for any commutative, associative, re-aggregatable spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, n_salts)."""
    cols = cols or df.columns
    return df.withColumn(SALT, F.pmod(F.xxhash64(*cols, F.lit(0x5A17)), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level aggregation: groupBy(keys+salt).agg(partial) then
    groupBy(keys).agg(final). ``final_aggs`` must re-aggregate the
    aliased outputs of ``partial_aggs`` (e.g. partial sum -> final sum,
    partial count -> final sum)."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def hub_ids(degrees: DataFrame, threshold: int) -> DataFrame:
    """Vertex ids whose degree exceeds ``threshold`` (the salting set)."""
    return degrees.filter(F.col("degree") > threshold).select("id")
