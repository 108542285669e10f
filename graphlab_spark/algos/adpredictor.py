"""AdPredictor — Bayesian online probit regression (CF toolkit).

Reference: ``/root/reference/toolkits/collaborative_filtering/
adpredictor.cpp`` (Graepel et al., ICML'10): every feature keeps a
Gaussian weight posterior ``N(mu, sigma)`` (``sigma`` is the
*variance*, init 1 — ``adpredictor.cpp:52-62``); every training row
gathers its active features' ``(sum mu, sum sigma)``
(``adpredictor_map``, ``:169-178``), forms

    product = y * xT_mu / sqrt(sigma_row)          (``:188``)

and scatters back per-feature updates (``:190-200``):

    mu    += y * x_ij * sigma_f / sqrt(sigma_row) * v(product)
    sigma *= 1 - (x_ij * sigma_f / sigma_row) * w(product)

with ``v(t) = N(t)/Phi(t)`` (``phi(t)==0`` guarded to 1e-5,
``:115-123``) and ``w(t) = v(t)(v(t)+t)``.  The reference's sweep is
already synchronous (warp ``parfor_all_vertices`` phase 1 then
phase 2, ``:453-455``), so this DataFrame port is the same schedule:
one sweep = row-side gather+products, then feature-side
sum-of-mu-deltas and product-of-sigma-factors.

``Phi`` is the Abramowitz-Stegun 7.1.26 polynomial the reference
inlines from ``cdf.hpp`` — reproduced arithmetic-for-arithmetic in
``operators.portable.phi_cdf`` so the DuckDB oracle
(``oracles.sql_adpredictor_weights``) replays the whole training
bit-for-bit.  Note the reference's row variance is ``sum sigma_f``
alone — beta**2 is assigned then overwritten (``:217-221``), so beta
never enters; we reproduce that faithfully.

This engine's instance: one training row per (supplier, part) pair of
lineitem, label y = +1 iff any of the pair's lineitems was returned
(``l_returnflag = 'R'``), two active features per row (the supplier
and the part, ``x_ij = 1``).

Plan shape: per sweep, one row-side join+agg over (row x feature) and
one feature-side join+agg back — the sigma product rides
``exp(sum(ln(factor)))`` with the factor clamped positive, keeping
everything a plain partial+final hash aggregation.  No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.portable import INV_SQRT_2PI, phi_cdf
from ..plans.checkpoint import truncate_lineage

FACTOR_FLOOR = 1e-6  # keeps the sigma factor positive for the log trick


def _v(t: Column) -> Column:
    """v(t) = N(t) / Phi(t), with the reference's phi==0 -> 1e-5 guard
    (``adpredictor.cpp:115-118``)."""
    p = phi_cdf(t)
    p = F.when(p == 0.0, 1e-5).otherwise(p)
    return F.lit(INV_SQRT_2PI) * F.exp(-t * t / 2) / p


def clicks_from_lineitem(lineitem: DataFrame) -> DataFrame:
    """(user, item, y): the training rows described in the module doc."""
    return lineitem.groupBy(
        F.col("l_suppkey").alias("user"), F.col("l_partkey").alias("item")
    ).agg(
        F.when(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
               == 1, 1.0).otherwise(-1.0).alias("y"))


def adpredictor(rows: DataFrame, iterations: int = 3
                ) -> tuple[DataFrame, DataFrame]:
    """Train on ``(user, item, y in {-1,+1})``.

    Returns (user_weights, item_weights), each ``(id, mu, sig)`` with
    ``sig`` the posterior variance.
    """
    rows = rows.select("user", "item", "y").persist()
    uw = rows.select(F.col("user").alias("id")).distinct().select(
        "id", F.lit(0.0).alias("mu"), F.lit(1.0).alias("sig"))
    iw = rows.select(F.col("item").alias("id")).distinct().select(
        "id", F.lit(0.0).alias("mu"), F.lit(1.0).alias("sig"))
    uw = truncate_lineage(uw)
    iw = truncate_lineage(iw)

    for _ in range(iterations):
        est = (
            rows
            .join(uw.select(F.col("id").alias("user"),
                            F.col("mu").alias("mu_u"),
                            F.col("sig").alias("sig_u")), "user")
            .join(iw.select(F.col("id").alias("item"),
                            F.col("mu").alias("mu_i"),
                            F.col("sig").alias("sig_i")), "item")
            .select(
                "user", "item", "y", "sig_u", "sig_i",
                (F.col("mu_u") + F.col("mu_i")).alias("m"),
                (F.col("sig_u") + F.col("sig_i")).alias("s"))
        )
        t = F.col("y") * F.col("m") / F.sqrt("s")
        vt = _v(t)
        wt = vt * (vt + t)
        scored = est.select(
            "user", "item", "y", "sig_u", "sig_i", "s",
            vt.alias("vt"), wt.alias("wt")).persist()

        def grads(key: str, sig: str):
            dmu = (F.col("y") * F.col(sig) / F.sqrt("s")) * F.col("vt")
            lnf = F.log(F.greatest(
                F.lit(1.0) - (F.col(sig) / F.col("s")) * F.col("wt"),
                F.lit(FACTOR_FLOOR)))
            return (scored.groupBy(F.col(key).alias("id"))
                    .agg(F.sum(dmu).alias("dmu"), F.sum(lnf).alias("lnf")))

        def apply_side(w: DataFrame, g: DataFrame) -> DataFrame:
            return truncate_lineage(
                w.join(g, "id", "left").select(
                    "id",
                    (F.col("mu") + F.coalesce("dmu", F.lit(0.0))).alias("mu"),
                    (F.col("sig")
                     * F.exp(F.coalesce("lnf", F.lit(0.0)))).alias("sig")))

        new_uw = apply_side(uw, grads("user", "sig_u"))
        new_iw = apply_side(iw, grads("item", "sig_i"))
        scored.unpersist()
        uw, iw = new_uw, new_iw

    rows.unpersist()
    return uw, iw


def predict_ctr(rows: DataFrame, uw: DataFrame, iw: DataFrame) -> DataFrame:
    """(user, item, ctr): Phi(sum mu / sqrt(sum sigma)) — the
    reference's ``ctr_predict`` probability (``adpredictor.cpp:154-156``
    with y = +1)."""
    est = (
        rows
        .join(uw.select(F.col("id").alias("user"),
                        F.col("mu").alias("mu_u"),
                        F.col("sig").alias("sig_u")), "user")
        .join(iw.select(F.col("id").alias("item"),
                        F.col("mu").alias("mu_i"),
                        F.col("sig").alias("sig_i")), "item")
    )
    z = (F.col("mu_u") + F.col("mu_i")) / F.sqrt(F.col("sig_u")
                                                 + F.col("sig_i"))
    return est.select("user", "item", phi_cdf(z).alias("ctr"))
