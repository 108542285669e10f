"""Bias-SGD matrix factorization (CF toolkit, SGD family).

Reference: ``/root/reference/toolkits/collaborative_filtering/
biassgd.cpp`` — the Koren-style model ``pred = GLOBAL_MEAN + b_u + b_i
+ p_u . q_i`` (``biassgd.cpp:235-237``) with per-edge updates

    b     += -GAMMA * (err + LAMBDA * b)          (``:249-250``)
    pvec  += -GAMMA * (err * other.pvec + LAMBDA * pvec)   (``:252-253``)

where ``err = pred - obs`` and GAMMA/LAMBDA are shared between the
bias and factor updates (``:536-537``).  As with :mod:`.sgd`, the BSP
analog of the async per-sample schedule is the deterministic
*full-batch* form: every iteration computes all errors against the
CURRENT parameters, then all parameters step simultaneously —

    b_u    += lr * ( sum_i e_ui            - reg * b_u )
    p_u[f] += lr * ( sum_i e_ui * q_i[f]   - reg * p_u[f] )

(symmetrically for items), with ``e = r - pred``.  This is exactly
replayable in ANSI SQL (``oracles.sql_biassgd_user_bias``).

Plan shape: factors live in LONG form ``(id, f, v)``; the biases ride
the SAME table as pseudo-feature ``f = -1`` so one join+agg+update
pipeline steps everything — the update rule ``v += lr*(g - reg*v)`` is
identical for biases and factors in the reference.  Per iteration:
one error computation (two shuffles: join on user, join on item+f),
one gradient union, one left-join update.  No UDFs, no driver math
beyond the global mean scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import truncate_lineage
from .sgd import _init_factors_long


def _with_bias_rows(factors: DataFrame, ids: DataFrame) -> DataFrame:
    """Append ``f = -1, v = 0.0`` bias rows to a long-form factor table
    (the reference initializes biases to 0 — ``biassgd.cpp:76``)."""
    bias = ids.select(
        "id", F.lit(-1).alias("f"), F.lit(0.0).alias("v"))
    return factors.unionByName(bias)


def biassgd(
    ratings: DataFrame,
    k: int = 4,
    iterations: int = 3,
    lr: float = 0.01,
    reg: float = 0.05,
) -> tuple[DataFrame, DataFrame, float]:
    """Train bias-SGD on ``(user, item, rating)``.

    Returns ``(user_params, item_params, mu)`` where each params table
    is long-form ``(id, f, v)`` with factor rows ``f in 0..k-1`` and
    the bias at ``f = -1``; ``mu`` is the global rating mean
    (``GLOBAL_MEAN``, computed once up front as in the reference's
    stats pass).
    """
    ratings = ratings.select("user", "item", "rating").persist()
    mu = float(ratings.agg(F.avg("rating")).first()[0])
    users = ratings.select(F.col("user").alias("id")).distinct()
    items = ratings.select(F.col("item").alias("id")).distinct()
    uf = _with_bias_rows(_init_factors_long(users, k, 0), users).persist()
    itf = _with_bias_rows(_init_factors_long(items, k, 1), items).persist()

    for _ in range(iterations):
        # e_ui = r - mu - b_u - b_i - sum_f p_uf q_if, against CURRENT
        # params.  Bias rows (f = -1) fold into the same aggregation:
        # sum over the union of {bias term} and {per-f products}.
        contrib = (
            ratings
            .join(uf.select(F.col("id").alias("user"), "f",
                            F.col("v").alias("pv")), "user")
            .join(itf.select(F.col("id").alias("item"), "f",
                             F.col("v").alias("qv")), ["item", "f"])
            .groupBy("user", "item", "rating")
            .agg(
                F.sum(F.when(F.col("f") >= 0,
                             F.col("pv") * F.col("qv"))
                      .otherwise(F.col("pv") + F.col("qv"))).alias("s"))
        )
        err = contrib.select(
            "user", "item",
            (F.col("rating") - F.lit(mu) - F.col("s")).alias("e"),
        ).persist()

        du = (
            err.join(itf.filter(F.col("f") >= 0)
                     .select(F.col("id").alias("item"), "f",
                             F.col("v").alias("qv")), "item")
            .groupBy(F.col("user").alias("id"), "f")
            .agg(F.sum(F.col("e") * F.col("qv")).alias("g"))
            .unionByName(
                err.groupBy(F.col("user").alias("id"))
                .agg(F.sum("e").alias("g"))
                .select("id", F.lit(-1).alias("f"), "g"))
        )
        di = (
            err.join(uf.filter(F.col("f") >= 0)
                     .select(F.col("id").alias("user"), "f",
                             F.col("v").alias("pv")), "user")
            .groupBy(F.col("item").alias("id"), "f")
            .agg(F.sum(F.col("e") * F.col("pv")).alias("g"))
            .unionByName(
                err.groupBy(F.col("item").alias("id"))
                .agg(F.sum("e").alias("g"))
                .select("id", F.lit(-1).alias("f"), "g"))
        )

        step = (F.col("v") + lr * (F.coalesce("g", F.lit(0.0))
                                   - reg * F.col("v"))).alias("v")
        new_uf_c = uf.join(du, ["id", "f"], "left").select("id", "f", step) \
            .persist()
        new_itf_c = itf.join(di, ["id", "f"], "left").select("id", "f", step) \
            .persist()
        new_uf = truncate_lineage(new_uf_c)
        new_itf = truncate_lineage(new_itf_c)
        for d in (new_uf_c, new_itf_c, err, uf, itf):
            d.unpersist()
        uf, itf = new_uf, new_itf

    ratings.unpersist()
    return uf, itf, mu


def biassgd_predict(ratings: DataFrame, uf: DataFrame, itf: DataFrame,
                    mu: float) -> DataFrame:
    """(user, item, rating, pred) for every training pair."""
    dot = (
        ratings
        .join(uf.select(F.col("id").alias("user"), "f",
                        F.col("v").alias("pv")), "user")
        .join(itf.select(F.col("id").alias("item"), "f",
                         F.col("v").alias("qv")), ["item", "f"])
        .groupBy("user", "item", "rating")
        .agg(F.sum(F.when(F.col("f") >= 0, F.col("pv") * F.col("qv"))
                   .otherwise(F.col("pv") + F.col("qv"))).alias("s"))
    )
    return dot.select("user", "item", "rating",
                      (F.lit(mu) + F.col("s")).alias("pred"))


def biassgd_rmse(ratings: DataFrame, uf: DataFrame, itf: DataFrame,
                 mu: float) -> DataFrame:
    """One-row (rmse) DataFrame over the training ratings (the
    reference's ``extract_l2_error`` aggregate, ``biassgd.cpp:375-386``
    — unclamped: MINVAL/MAXVAL default to +-1e100)."""
    p = biassgd_predict(ratings, uf, itf, mu)
    return p.agg(
        F.sqrt(F.avg((F.col("rating") - F.col("pred")) ** 2)).alias("rmse"))
