"""SVD++ matrix factorization (CF toolkit, SGD family, implicit
feedback).

Reference: ``/root/reference/toolkits/collaborative_filtering/
svdpp.cpp`` — Koren's KDD'08 model (cited in the file header): per
vertex the model keeps factors ``pvec``, an implicit-feedback vector
``weight`` and a ``bias`` (``svdpp.cpp:77-92``); each engine iteration
is two phases — PHASE1 gathers the user's implicit sum
``w_u = |N(u)|^{-1/2} * sum_{j in N(u)} y_j`` (``:283, :357-360``),
PHASE2 computes errors and steps every parameter (``:287-312``).

We implement the *paper* formulas the reference cites, in the same
deterministic full-batch BSP form as :mod:`.sgd` / :mod:`.biassgd`
(the reference's per-edge C++ additionally carries a parenthesization
slip in the p_u regularizer at ``svdpp.cpp:303`` — the regularizer is
scaled by the per-edge error — which we do not reproduce):

    pred_ui  = mu + b_u + b_i + sum_f q_if * (p_uf + w_uf)
    e        = r - pred                       (all against CURRENT params)
    b_u     += lr * ( sum_i e_ui                      - reg * b_u )
    b_i     += lr * ( sum_u e_ui                      - reg * b_i )
    p_uf    += lr * ( sum_i e_ui * q_if               - reg * p_uf )
    q_if    += lr * ( sum_u e_ui * (p_uf + w_uf)      - reg * q_if )
    y_jf    += lr * ( sum_{u: j in N(u)} n_u^{-1/2} * t_uf - reg * y_jf )

with ``t_uf = sum_i e_ui * q_if`` (shared with the p-gradient) and
``n_u = |N(u)|``.  One shared lr/reg pair stands in for the
reference's per-parameter step/reg knobs (``:300-310``), which all
default to the same base values.

Plan shape: three long-form parameter tables (user p, item q, item y)
plus f = -1 bias rows on the p/q tables, exactly as :mod:`.biassgd`.
Per iteration: the implicit sums w are one join+agg over ratings x y;
the error is one two-sided join+agg; t is reused for both the p and y
gradients — every step is equi-joins plus partial+final hash
aggregations, no UDFs, no driver math beyond the mu scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import truncate_lineage
from .biassgd import _with_bias_rows
from .sgd import _init_factors_long


def _implicit_sums(ratings: DataFrame, yf: DataFrame,
                   nu: DataFrame) -> DataFrame:
    """w_uf = |N(u)|^{-1/2} * sum_{j in N(u)} y_jf  -> (user, f, w)."""
    return (
        ratings.join(yf.select(F.col("id").alias("item"), "f",
                               F.col("v").alias("yv")), "item")
        .groupBy("user", "f")
        .agg(F.sum("yv").alias("s"))
        .join(nu, "user")
        .select("user", "f",
                (F.col("s") / F.sqrt(F.col("nu"))).alias("w"))
    )


def svdpp(
    ratings: DataFrame,
    k: int = 4,
    iterations: int = 3,
    lr: float = 0.01,
    reg: float = 0.05,
) -> tuple[DataFrame, DataFrame, DataFrame, float]:
    """Train SVD++ on ``(user, item, rating)``.

    Returns ``(user_params, item_params, item_implicit, mu)``: the
    first two are long-form ``(id, f, v)`` with bias at ``f = -1``,
    ``item_implicit`` is the y table ``(id, f, v)`` (factors only).
    """
    ratings = ratings.select("user", "item", "rating").persist()
    mu = float(ratings.agg(F.avg("rating")).first()[0])
    users = ratings.select(F.col("user").alias("id")).distinct()
    items = ratings.select(F.col("item").alias("id")).distinct()
    nu = ratings.groupBy("user").agg(F.count("*").alias("nu")).persist()
    uf = _with_bias_rows(_init_factors_long(users, k, 0), users).persist()
    itf = _with_bias_rows(_init_factors_long(items, k, 1), items).persist()
    yf = _init_factors_long(items, k, 2).persist()

    for _ in range(iterations):
        w = _implicit_sums(ratings, yf, nu).persist()

        # e_ui = r - mu - b_u - b_i - sum_f q_if (p_uf + w_uf).  Bias
        # rows (f = -1) fold into the same aggregation as in biassgd;
        # w only exists for f >= 0, so left-join and coalesce.
        contrib = (
            ratings
            .join(uf.select(F.col("id").alias("user"), "f",
                            F.col("v").alias("pv")), "user")
            .join(itf.select(F.col("id").alias("item"), "f",
                             F.col("v").alias("qv")), ["item", "f"])
            .join(w, ["user", "f"], "left")
            .groupBy("user", "item", "rating")
            .agg(F.sum(
                F.when(F.col("f") >= 0,
                       F.col("qv") * (F.col("pv")
                                      + F.coalesce("w", F.lit(0.0))))
                .otherwise(F.col("pv") + F.col("qv"))).alias("s"))
        )
        err = contrib.select(
            "user", "item",
            (F.col("rating") - F.lit(mu) - F.col("s")).alias("e"),
        ).persist()

        # t_uf = sum_i e_ui q_if: the p-gradient, reused for y.
        t = (
            err.join(itf.filter(F.col("f") >= 0)
                     .select(F.col("id").alias("item"), "f",
                             F.col("v").alias("qv")), "item")
            .groupBy("user", "f")
            .agg(F.sum(F.col("e") * F.col("qv")).alias("t"))
            .persist()
        )

        du = (
            t.select(F.col("user").alias("id"), "f", F.col("t").alias("g"))
            .unionByName(
                err.groupBy(F.col("user").alias("id"))
                .agg(F.sum("e").alias("g"))
                .select("id", F.lit(-1).alias("f"), "g"))
        )
        di = (
            err.join(uf.filter(F.col("f") >= 0)
                     .select(F.col("id").alias("user"), "f",
                             F.col("v").alias("pv")), "user")
            .join(w, ["user", "f"], "left")
            .groupBy(F.col("item").alias("id"), "f")
            .agg(F.sum(F.col("e") * (F.col("pv")
                                     + F.coalesce("w", F.lit(0.0))))
                 .alias("g"))
            .unionByName(
                err.groupBy(F.col("item").alias("id"))
                .agg(F.sum("e").alias("g"))
                .select("id", F.lit(-1).alias("f"), "g"))
        )
        dy = (
            ratings.join(t, "user")
            .join(nu, "user")
            .groupBy(F.col("item").alias("id"), "f")
            .agg(F.sum(F.col("t") / F.sqrt(F.col("nu"))).alias("g"))
        )

        step = (F.col("v") + lr * (F.coalesce("g", F.lit(0.0))
                                   - reg * F.col("v"))).alias("v")
        new_uf_c = uf.join(du, ["id", "f"], "left") \
            .select("id", "f", step).persist()
        new_itf_c = itf.join(di, ["id", "f"], "left") \
            .select("id", "f", step).persist()
        new_yf_c = yf.join(dy, ["id", "f"], "left") \
            .select("id", "f", step).persist()
        new_uf = truncate_lineage(new_uf_c)
        new_itf = truncate_lineage(new_itf_c)
        new_yf = truncate_lineage(new_yf_c)
        for d in (new_uf_c, new_itf_c, new_yf_c, t, err, w, uf, itf, yf):
            d.unpersist()
        uf, itf, yf = new_uf, new_itf, new_yf

    nu.unpersist()
    ratings.unpersist()
    return uf, itf, yf, mu


def svdpp_predict(ratings: DataFrame, uf: DataFrame, itf: DataFrame,
                  yf: DataFrame, mu: float) -> DataFrame:
    """(user, item, rating, pred) for every training pair."""
    nu = ratings.groupBy("user").agg(F.count("*").alias("nu"))
    w = _implicit_sums(ratings, yf, nu)
    dot = (
        ratings
        .join(uf.select(F.col("id").alias("user"), "f",
                        F.col("v").alias("pv")), "user")
        .join(itf.select(F.col("id").alias("item"), "f",
                         F.col("v").alias("qv")), ["item", "f"])
        .join(w, ["user", "f"], "left")
        .groupBy("user", "item", "rating")
        .agg(F.sum(
            F.when(F.col("f") >= 0,
                   F.col("qv") * (F.col("pv")
                                  + F.coalesce("w", F.lit(0.0))))
            .otherwise(F.col("pv") + F.col("qv"))).alias("s"))
    )
    return dot.select("user", "item", "rating",
                      (F.lit(mu) + F.col("s")).alias("pred"))


def svdpp_rmse(ratings: DataFrame, uf: DataFrame, itf: DataFrame,
               yf: DataFrame, mu: float) -> DataFrame:
    """One-row (rmse) training error (``extract_l2_error`` aggregate,
    ``svdpp.cpp:428-446``; unclamped — MINVAL/MAXVAL default wide)."""
    p = svdpp_predict(ratings, uf, itf, yf, mu)
    return p.agg(
        F.sqrt(F.avg((F.col("rating") - F.col("pred")) ** 2)).alias("rmse"))
