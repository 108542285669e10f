"""Bucket-size guard for LSH candidate generation.

Banded MinHash and hyperplane-LSH candidate joins fan out on a bucket
key; a pathological mega-bucket (B near-identical boilerplate documents
sharing one band signature) makes the bucket self-join emit B^2
candidate rows *before* any prefilter can run.  Production LSH systems
cap or split oversized buckets; this module implements the cap, with the
dropped volume observable per the no-silent-caps rule:

- ``cap_bucket_groups`` drops every row belonging to a group larger than
  ``max_rows`` and attaches an ``observe`` metric
  (``<label>_rows_dropped`` / ``<label>_rows_total``) to the returned
  plan, so any action on the downstream query reports the drop in the
  Spark UI SQL metrics (or via a registered QueryExecutionListener);
- ``oversized_groups`` returns the dropped groups + sizes as a
  DataFrame for direct audit.

Rationale for *drop* (not split): exact duplicates — the dominant cause
of mega-buckets — are already caught by the much cheaper exact-hash
dedup (``dedup.exact_dup_groups``); what the cap forfeits is only
near-dup pairs inside a pathological bucket, in exchange for bounding
the candidate join at ``max_rows^2`` per bucket at any corpus size.
``max_rows=None`` disables the guard (the exact mode the DuckDB oracles
replay; defaults are far above any bucket the test corpora produce, so
guarded and exact results agree there — asserted by the driver contract
hashes and the planted mega-bucket test).

The reference has no analog (its dedup story is single-node); this is a
training-data-pipeline extension per the project brief.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: default cap on rows per LSH bucket group before the candidate
#: self-join (bounds that join at LSH_MAX_BUCKET^2 rows per bucket).
LSH_MAX_BUCKET = 1024

# warn-once registry: callers without Spark-UI access still get one
# warning-level line per guard label saying the cap is engaged and how
# to audit the dropped volume (ADVICE r4: the observe metric alone is
# invisible outside the UI / a registered JVM listener).
_warned_labels: set[str] = set()


def cap_bucket_groups(df: DataFrame, keys: list[str],
                      max_rows: int | None = LSH_MAX_BUCKET,
                      label: str = "lsh_guard") -> DataFrame:
    """Drop rows whose ``keys`` group exceeds ``max_rows`` members.

    Group sizes come from a ``groupBy(keys).count()`` — map-side partial
    aggregation, so even a pathological billion-row bucket is counted in
    parallel (no single-task window funnel; VERDICT r4 item 4).  The few
    oversized keys (at most ``N / max_rows``) are then removed with a
    null-marker left join on the same bucket key the downstream
    candidate join shuffles on; AQE broadcasts the oversized-key side at
    any realistic size.  O(B^2) candidates never materialize — that is
    the point of the guard.
    """
    if max_rows is None:
        return df
    if label not in _warned_labels:
        _warned_labels.add(label)
        log.warning(
            "%s: LSH bucket guard active — groups on %s larger than %d "
            "rows are dropped before the candidate join; audit dropped "
            "volume via oversized_groups() or the '%s_bucket_guard' "
            "observe metric (pass max_rows=None for exact mode)",
            label, keys, max_rows, label)
    over = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__gsz"))
        .filter(F.col("__gsz") > max_rows)
        .select(*keys)
        .withColumn("__over", F.lit(1))
    )
    marked = df.join(over, keys, "left")
    marked = marked.observe(
        f"{label}_bucket_guard",
        F.sum(F.when(F.col("__over") == 1, 1).otherwise(0))
         .alias(f"{label}_rows_dropped"),
        F.count(F.lit(1)).alias(f"{label}_rows_total"),
    )
    return (
        marked.filter(F.col("__over").isNull())
        .select(*df.columns)
    )


def oversized_groups(df: DataFrame, keys: list[str],
                     max_rows: int = LSH_MAX_BUCKET) -> DataFrame:
    """(keys..., group_rows) for every group the guard would drop —
    the audit companion to ``cap_bucket_groups``."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("group_rows"))
        .filter(F.col("group_rows") > max_rows)
    )
