"""Non-negative matrix factorization (CF toolkit, NMF).

Reference: ``/root/reference/toolkits/collaborative_filtering/nmf.cpp``
(Lee–Seung multiplicative updates over the observed ratings, gathered
edge-parallel over the bipartite graph).  The engine uses the same
masked alternating updates —

    W(u,f) *= sum_obs r(u,i) H(i,f)   / (sum_obs pred(u,i) H(i,f) + eps)
    H(i,f) *= sum_obs r(u,i) W'(u,f)  / (sum_obs pred'(u,i) W'(u,f) + eps)

with ``pred = sum_f W H`` over observed pairs only, H updated against
the freshly-updated W' (alternating — the simultaneous/Jacobi variant
oscillates on this data, measured).  Strictly positive portable-LCG
init keeps every factor non-negative forever (multiplicative updates
preserve sign).  All long-form joins + hash aggregations; the DuckDB
oracle (``oracles.sql_nmf_user_factors``) replays every half-sweep by
textually inlining the W' update into H's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.portable import lcg_hash
from ..plans.checkpoint import truncate_lineage

EPS = 1e-9


def _init_positive(ids: DataFrame, k: int, side: int) -> DataFrame:
    """(id, f, v): v = 0.1 + 0.4*lcg_unit(id*31 + f*7 + side*13) > 0."""
    fs = ids.sparkSession.range(k).select(F.col("id").cast("int").alias("f"))
    seed = (F.col("id") * 31 + F.col("f") * 7 + F.lit(side * 13))
    return ids.crossJoin(fs).select(
        "id", "f",
        (F.lit(0.1) + F.lit(0.4) * (lcg_hash(seed) / F.lit(2.0 ** 31)))
        .alias("v"))


def _half_sweep(ratings: DataFrame, this: DataFrame, other: DataFrame,
                this_key: str, other_key: str, eps: float) -> DataFrame:
    """One multiplicative update of ``this`` (keyed by this_key in the
    ratings) against ``other`` — the W-update with (user, item), the
    H-update with (item, user)."""
    pred = (
        ratings
        .join(this.select(F.col("id").alias(this_key), "f",
                          F.col("v").alias("tv")), this_key)
        .join(other.select(F.col("id").alias(other_key), "f",
                           F.col("v").alias("ov")), [other_key, "f"])
        .groupBy(this_key, other_key, "rating")
        .agg(F.sum(F.col("tv") * F.col("ov")).alias("p"))
    )
    num = (
        ratings.join(other.select(F.col("id").alias(other_key), "f",
                                  F.col("v").alias("ov")), other_key)
        .groupBy(F.col(this_key).alias("id"), "f")
        .agg(F.sum(F.col("rating") * F.col("ov")).alias("s"))
    )
    den = (
        pred.join(other.select(F.col("id").alias(other_key), "f",
                               F.col("v").alias("ov")), other_key)
        .groupBy(F.col(this_key).alias("id"), "f")
        .agg(F.sum(F.col("p") * F.col("ov")).alias("s"))
    )
    return (
        this.join(num.withColumnRenamed("s", "ns"), ["id", "f"])
        .join(den.withColumnRenamed("s", "ds"), ["id", "f"])
        .select("id", "f",
                (F.col("v") * F.col("ns") / (F.col("ds") + eps)).alias("v"))
    )


def nmf(ratings: DataFrame, k: int = 4, iterations: int = 3,
        eps: float = EPS) -> tuple[DataFrame, DataFrame]:
    """Returns (W, H) in long form (id, f, v), all values >= 0."""
    ratings = ratings.select("user", "item", "rating").persist()
    w = _init_positive(
        ratings.select(F.col("user").alias("id")).distinct(), k, 0).persist()
    h = _init_positive(
        ratings.select(F.col("item").alias("id")).distinct(), k, 1).persist()
    for _ in range(iterations):
        w_cache = _half_sweep(ratings, w, h, "user", "item", eps).persist()
        new_w = truncate_lineage(w_cache)
        w_cache.unpersist()
        w.unpersist()
        w = new_w
        h_cache = _half_sweep(ratings, h, w, "item", "user", eps).persist()
        new_h = truncate_lineage(h_cache)
        h_cache.unpersist()
        h.unpersist()
        h = new_h
    ratings.unpersist()
    return w, h


def nmf_objective(ratings: DataFrame, w: DataFrame, h: DataFrame) -> float:
    """Masked squared-error objective sum_obs (r - pred)^2."""
    pred = (
        ratings
        .join(w.select(F.col("id").alias("user"), "f",
                       F.col("v").alias("wv")), "user")
        .join(h.select(F.col("id").alias("item"), "f",
                       F.col("v").alias("hv")), ["item", "f"])
        .groupBy("user", "item", "rating")
        .agg(F.sum(F.col("wv") * F.col("hv")).alias("p"))
    )
    return float(pred.agg(
        F.sum((F.col("rating") - F.col("p")) ** 2)).first()[0])
