"""Latent Dirichlet Allocation by CVB0 (topic-modeling toolkit).

Reference: ``/root/reference/toolkits/topic_modeling/cgs_lda.cpp:445``
— collapsed Gibbs sampling over the doc x word bipartite graph, where
each edge (doc, word, count) carries topic assignments and the gather
accumulates topic counts.  A BSP engine with an oracle-replayable
contract uses the *deterministic* collapsed variational analog (CVB0,
Asuncion et al. 2009): per-token topic responsibilities
``gamma(d,w,k)`` replace samples, and one superstep is

    n_wk = sum_d cnt * gamma      (word-topic expected counts)
    n_dk = sum_w cnt * gamma      (doc-topic expected counts)
    n_k  = sum_w n_wk
    gamma'(d,w,k) ∝ (n_wk - g + beta) * (n_dk - g + alpha)
                    / (n_k - g + V*beta)          [g = own contribution]

— i.e. exactly the reference's gather/apply shape (edge-parallel
aggregation into word-side and doc-side counters) with expectations
instead of samples.  Per-type token weighting: one gamma per distinct
(doc, word) pair, weighted by its count (the standard batch-CVB0
simplification).

Everything is long-form joins + hash aggregations; init
responsibilities come from the portable LCG so the DuckDB oracle
(``oracles.sql_lda_word_topics``) replays every iteration exactly.
Tokenization matches ``functions.text.token_frequencies`` (lowercase
whitespace split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.portable import lcg_hash
from ..plans.checkpoint import truncate_lineage

ALPHA = 0.5
BETA = 0.1


def doc_word_counts(docs: DataFrame, portable: bool = True) -> DataFrame:
    """(doc_id, wid, word, cnt).

    ``portable=True``: wid = dense 1-based rank of the word (the
    portable 'hash' domain the DuckDB oracle replays, like dedup's
    shingle dim).  The dense rank is a single-partition window sort
    over the *vocabulary* — fine at test scale, a bottleneck on a
    100 TB corpus (vocab ~10^8).  ``portable=False`` is the scale
    path: wid = xxhash64(word), no global sort anywhere (same split
    as ``functions.dedup``'s portable flag); init seeds differ, so it
    is a different — equally valid — random initialization."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
    ).filter(F.length("word") > 0)
    counts = toks.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    if not portable:
        return counts.select(
            "doc_id", F.xxhash64("word").alias("wid"), "word", "cnt")
    dim = (
        counts.select("word").distinct()
        .select("word", F.row_number().over(Window.orderBy("word"))
                .cast("long").alias("wid"))
    )
    return counts.join(dim, "word").select("doc_id", "wid", "word", "cnt")


def lda_cvb0(
    docs: DataFrame,
    k: int = 4,
    iterations: int = 2,
    alpha: float = ALPHA,
    beta: float = BETA,
    portable: bool = True,
) -> DataFrame:
    """Returns the converged responsibilities ``(doc_id, wid, word,
    cnt, k, g)`` after ``iterations`` CVB0 sweeps.

    ``portable=False`` switches word ids (and hence the pseudo-random
    init) to the sort-free xxhash64 scale path — see
    ``doc_word_counts``."""
    dw = doc_word_counts(docs, portable=portable).persist()
    n_vocab = dw.select("wid").distinct().count()
    topics = docs.sparkSession.range(k).select(
        F.col("id").cast("int").alias("k"))
    # pmod keeps the seed arithmetic inside int64 under ANSI mode when
    # ids are full-range xxhash64 values (portable=False); for the
    # portable dense-rank domain pmod is the identity, so the oracle's
    # seed expression (doc_id * 1009 + wid * 101 + k) is unchanged.
    wid_s = F.pmod(F.col("wid"), F.lit(2 ** 31))
    doc_s = F.pmod(F.col("doc_id"), F.lit(2 ** 31))
    seed = (doc_s * 1009 + wid_s * 101 + F.col("k"))
    raw = (F.lit(1.0) + lcg_hash(seed) / F.lit(2.0 ** 31)).alias("raw")
    g0 = dw.crossJoin(topics).select("doc_id", "wid", "word", "cnt", "k", raw)
    norm = Window.partitionBy("doc_id", "wid")
    gamma = g0.select(
        "doc_id", "wid", "word", "cnt", "k",
        (F.col("raw") / F.sum("raw").over(norm)).alias("g"))
    gamma = truncate_lineage(gamma)
    for _ in range(iterations):
        n_wk = gamma.groupBy("wid", "k").agg(
            F.sum(F.col("cnt") * F.col("g")).alias("nwk"))
        n_dk = gamma.groupBy("doc_id", "k").agg(
            F.sum(F.col("cnt") * F.col("g")).alias("ndk"))
        n_k = n_wk.groupBy("k").agg(F.sum("nwk").alias("nk"))
        unnorm = (
            gamma.join(n_wk, ["wid", "k"])
            .join(n_dk, ["doc_id", "k"])
            .join(n_k, "k")
            .select(
                "doc_id", "wid", "word", "cnt", "k",
                ((F.col("nwk") - F.col("g") + F.lit(beta))
                 * (F.col("ndk") - F.col("g") + F.lit(alpha))
                 / (F.col("nk") - F.col("g") + F.lit(n_vocab * beta))
                 ).alias("raw"),
            )
        )
        new_gamma = unnorm.select(
            "doc_id", "wid", "word", "cnt", "k",
            (F.col("raw") / F.sum("raw").over(norm)).alias("g"))
        cached = new_gamma.persist()
        nxt = truncate_lineage(cached)
        cached.unpersist()
        gamma.unpersist()
        gamma = nxt
    dw.unpersist()
    return gamma


def word_topics(gamma: DataFrame) -> DataFrame:
    """(word, k, weight): expected word-topic counts — the reference's
    per-word topic counter output, rounded for the oracle compare."""
    return (
        gamma.groupBy("word", "k")
        .agg(F.round(F.sum(F.col("cnt") * F.col("g")), 6).alias("weight"))
    )
