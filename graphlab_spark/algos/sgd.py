"""Gradient-descent matrix factorization (CF toolkit, SGD family).

Reference: ``/root/reference/toolkits/collaborative_filtering/sgd.cpp``
(per-edge stochastic updates ``p += lr*(e*q - reg*p)``, ``sgd.cpp:217``
area).  A bulk-synchronous engine with an oracle-replayable contract
uses the *deterministic full-batch* form of the same update: every
iteration computes all errors against the CURRENT factors, then both
sides step simultaneously —

    p_u[f] += lr * ( sum_i e_ui * q_i[f]  -  reg * p_u[f] )
    q_i[f] += lr * ( sum_u e_ui * p_u[f]  -  reg * q_i[f] )

Stochastic per-sample order is a scheduling detail of the async
reference engine; the batch form is the BSP-consistent analog (same
fixed point family) and is exactly replayable in ANSI SQL
(``oracles.sql_sgd_factors``).

Plan shape: factors live in LONG form ``(id, f, v)`` — every step is
plain equi-joins plus partial+final hash aggregations, no arrays, no
UDFs, no driver-side math.  Init values come from the portable LCG so
any engine reproduces them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.portable import lcg_hash
from ..plans.checkpoint import truncate_lineage

INIT_SCALE = 0.1


def _init_factors_long(ids: DataFrame, k: int, side: int) -> DataFrame:
    """(id, f, v): v = INIT_SCALE * lcg_unit(id*31 + f*7 + side*13)."""
    spark = ids.sparkSession
    fs = spark.range(k).select(F.col("id").cast("int").alias("f"))
    seed = (F.col("id") * 31 + F.col("f") * 7 + F.lit(side * 13))
    return ids.crossJoin(fs).select(
        "id", "f",
        (F.lit(INIT_SCALE) * (lcg_hash(seed) / F.lit(2.0 ** 31))).alias("v"),
    )


def sgd(
    ratings: DataFrame,
    k: int = 4,
    iterations: int = 3,
    lr: float = 0.01,
    reg: float = 0.05,
) -> tuple[DataFrame, DataFrame]:
    """Returns (user_factors, item_factors) in long form (id, f, v)."""
    ratings = ratings.select("user", "item", "rating").persist()
    uf = _init_factors_long(
        ratings.select(F.col("user").alias("id")).distinct(), k, 0).persist()
    itf = _init_factors_long(
        ratings.select(F.col("item").alias("id")).distinct(), k, 1).persist()
    for _ in range(iterations):
        err = (
            ratings
            .join(uf.select(F.col("id").alias("user"), "f",
                            F.col("v").alias("pv")), "user")
            .join(itf.select(F.col("id").alias("item"), "f",
                             F.col("v").alias("qv")), ["item", "f"])
            .groupBy("user", "item", "rating")
            .agg(F.sum(F.col("pv") * F.col("qv")).alias("pred"))
            .select("user", "item",
                    (F.col("rating") - F.col("pred")).alias("e"))
            .persist()
        )
        du = (
            err.join(itf.select(F.col("id").alias("item"), "f",
                                F.col("v").alias("qv")), "item")
            .groupBy(F.col("user").alias("id"), "f")
            .agg(F.sum(F.col("e") * F.col("qv")).alias("g"))
        )
        di = (
            err.join(uf.select(F.col("id").alias("user"), "f",
                               F.col("v").alias("pv")), "user")
            .groupBy(F.col("item").alias("id"), "f")
            .agg(F.sum(F.col("e") * F.col("pv")).alias("g"))
        )
        new_uf_c = (
            uf.join(du, ["id", "f"], "left")
            .select("id", "f",
                    (F.col("v") + lr * (F.coalesce("g", F.lit(0.0))
                                        - reg * F.col("v"))).alias("v"))
            .persist()
        )
        new_itf_c = (
            itf.join(di, ["id", "f"], "left")
            .select("id", "f",
                    (F.col("v") + lr * (F.coalesce("g", F.lit(0.0))
                                        - reg * F.col("v"))).alias("v"))
            .persist()
        )
        new_uf = truncate_lineage(new_uf_c)
        new_itf = truncate_lineage(new_itf_c)
        for d in (new_uf_c, new_itf_c, err, uf, itf):
            d.unpersist()
        uf, itf = new_uf, new_itf
    ratings.unpersist()
    return uf, itf


def sgd_rmse(ratings: DataFrame, uf: DataFrame, itf: DataFrame) -> DataFrame:
    """One-row (rmse) DataFrame over the training ratings."""
    pred = (
        ratings
        .join(uf.select(F.col("id").alias("user"), "f",
                        F.col("v").alias("pv")), "user")
        .join(itf.select(F.col("id").alias("item"), "f",
                         F.col("v").alias("qv")), ["item", "f"])
        .groupBy("user", "item", "rating")
        .agg(F.sum(F.col("pv") * F.col("qv")).alias("pred"))
    )
    return pred.agg(
        F.sqrt(F.avg((F.col("rating") - F.col("pred")) ** 2)).alias("rmse"))
