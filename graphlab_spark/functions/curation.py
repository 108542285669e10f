"""Corpus-curation operators: deterministic sampling, PII scrubbing,
eval-set decontamination, and token-budget sequence packing.

The last mile of a training-data pipeline after dedup/quality scoring:
pick a reproducible subset (optionally with per-stratum rates — e.g.
keep 100% of high-quality docs, 10% of mid, 0% of low), redact obvious
PII spans, drop documents that leak benchmark/eval text, and pack what
survives into fixed-token training chunks.  All pure column
expressions with DuckDB-replayable SQL twins (the portability rule
from ``operators/portable``):

- ``hash_sample`` / ``stratified_sample``: membership decided by a
  2-round LCG hash of the document id — the SAME rows are kept on any
  engine, any partitioning, any run (never ``rand()``, which Spark
  re-rolls per task retry);
- ``scrub_pii``: email / phone / IPv4 redaction via regexes restricted
  to the RE2-safe subset (char classes, bounded repeats, ``\\b``) so
  Spark's Java regex and DuckDB's RE2 agree byte-for-byte;
- ``decontaminate``: per-document word n-gram overlap against a
  benchmark corpus (the GPT-3/PaLM 13-gram-collision rule);
- ``pack_sequences``: deterministic concat-and-chop packing of
  documents into ``budget``-token chunks within hash shards.

Scale shape: sampling/scrubbing pipeline into the scan (zero
shuffles); decontamination broadcasts the benchmark n-gram set;
packing's only ordering is a per-shard window (shard count = the
parallelism knob, the same layout real packing pipelines use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.portable import M, lcg_hash, sql_lcg_hash
from .text import sql_ws_token_count, ws_token_count

SAMPLE_SEED = 104_729  # prime offset mixed into the id before hashing

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _keep(key_col: str, seed: int) -> F.Column:
    """Uniform-in-[0,1) membership draw from the portable LCG hash."""
    return (lcg_hash(F.col(key_col) + F.lit(seed)) + F.lit(0.5)) / F.lit(float(M))


def sql_keep(key_col: str = "doc_id", seed: int = SAMPLE_SEED) -> str:
    return f"(({sql_lcg_hash(f'({key_col} + {seed})')}) + 0.5) / {float(M)}"


def hash_sample(docs: DataFrame, rate: float, key_col: str = "doc_id",
                seed: int = SAMPLE_SEED) -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on ``key_col``:
    the kept set is a pure function of (id, seed) — stable across
    engines, retries, and partitionings, and monotone in ``rate``
    (raising the rate only ADDS documents, never swaps them)."""
    return docs.filter(_keep(key_col, seed) < F.lit(rate))


def sql_hash_sample(rate: float, table: str = "documents",
                    key_col: str = "doc_id",
                    seed: int = SAMPLE_SEED) -> str:
    return (f"SELECT * FROM {table} "
            f"WHERE {sql_keep(key_col, seed)} < {rate!r}")


def stratified_sample(
    docs: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    seed: int = SAMPLE_SEED,
) -> DataFrame:
    """Per-stratum deterministic sampling: each document's keep-draw is
    compared against its stratum's rate (e.g. ``{'en': 1.0,
    'und': 0.1}`` on a language column).  Same monotone/stable
    guarantees as ``hash_sample``; one scan, no shuffle."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))) \
                .otherwise(rate)
    return docs.filter(_keep(key_col, seed) < rate)


def sql_stratified_sample(
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    table: str = "documents",
    key_col: str = "doc_id",
    seed: int = SAMPLE_SEED,
) -> str:
    case = "CASE " + " ".join(
        # stratum values come from data: escape embedded quotes so the
        # emitted SQL stays well-formed (and un-injectable)
        f"WHEN {stratum_col} = '{v.replace(chr(39), chr(39) * 2)}' "
        f"THEN {float(r)!r}"
        for v, r in sorted(rates.items())
    ) + f" ELSE {float(default_rate)!r} END"
    return (f"SELECT * FROM {table} "
            f"WHERE {sql_keep(key_col, seed)} < {case}")


def scrub_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, text, n_emails, n_phones, n_ips): redact emails,
    phone-shaped numbers, and IPv4 literals to ``<EMAIL>`` /
    ``<PHONE>`` / ``<IP>`` placeholders, counting each.  Redaction
    order (emails first) is part of the contract — an email never
    half-matches as a phone afterwards."""
    t = F.col("text")
    n_e = F.regexp_count(t, F.lit(EMAIL_RE))
    t = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_p = F.regexp_count(t, F.lit(PHONE_RE))
    t = F.regexp_replace(t, PHONE_RE, "<PHONE>")
    n_i = F.regexp_count(t, F.lit(IPV4_RE))
    t = F.regexp_replace(t, IPV4_RE, "<IP>")
    return docs.select(
        "doc_id", t.alias("text"),
        n_e.cast("long").alias("n_emails"),
        n_p.cast("long").alias("n_phones"),
        n_i.cast("long").alias("n_ips"),
    )


DECON_N = 5  # word n-gram order; real corpora use 13 (GPT-3 App. C) —
#              5 keeps hit variance on the tiny-vocab synthetic testdata
PACK_BUDGET = 64     # tokens per training chunk (testdata-sized)
PACK_SHARDS = 8      # packing shards = parallelism of the chop
PACK_SEED = 15_485_863


def _word_ngram_arrays(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, n_ngrams, ngs): lowercased whitespace-token word
    n-grams per document (empty array when the doc has < n tokens)."""
    toks = F.when(
        F.length(F.trim("text")) == 0, F.expr("array()")
    ).otherwise(F.split(F.lower(F.trim("text")), r"\s+"))
    ngs = F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> array_join(slice(toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (docs.select("doc_id", toks.alias("toks"))
                .select("doc_id", ngs.alias("ngs"))
                .select("doc_id", F.size("ngs").cast("long")
                        .alias("n_ngrams"), "ngs"))


def _sql_word_ngrams(n: int, source: str) -> str:
    """DuckDB twin of ``_word_ngram_arrays`` exploded to one row per
    n-gram position: SELECT doc_id, ng FROM <derived>."""
    return f"""
    SELECT doc_id,
           unnest([array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                   for i in generate_series(1, len(toks) - {n - 1})]) AS ng
    FROM (SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
                 END AS toks
          FROM {source})
    WHERE len(toks) >= {n}"""


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = DECON_N, portable: bool = True) -> DataFrame:
    """(doc_id, n_ngrams, n_hits, hit_frac, contaminated): per-document
    benchmark-leak check — how many of the doc's word ``n``-gram
    positions also occur anywhere in ``benchmark`` (the eval-set
    decontamination rule of GPT-3 Appendix C / PaLM §8: a training doc
    is contaminated if it shares any length-n token span with an eval
    document).  Docs with < n tokens report 0 n-grams, uncontaminated.

    Scale shape: the benchmark n-gram set is distinct-reduced and
    **broadcast** (eval sets are tiny next to a training corpus), so
    the corpus side never shuffles for the membership probe; the only
    corpus shuffle is the final partial+final count by doc_id.
    ``portable=False`` joins on ``xxhash64`` of the n-gram instead of
    the string — narrower rows at 100 TB; the portable string form is
    what the DuckDB oracle replays.
    """
    corpus = _word_ngram_arrays(docs, n)
    key = (lambda c: F.xxhash64(c)) if not portable else (lambda c: c)
    bench = (_word_ngram_arrays(benchmark, n)
             .select(F.explode("ngs").alias("ng"))
             .select(key(F.col("ng")).alias("k")).distinct())
    pos = corpus.select("doc_id", F.explode("ngs").alias("ng")) \
                .select("doc_id", key(F.col("ng")).alias("k"))
    hits = (pos.join(F.broadcast(bench), "k", "left_semi")
               .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    # second consumer of `corpus` would re-run the full n-gram build;
    # derive the count arithmetically from the token split instead
    # (exactly the SQL twin's `base` CTE), so the corpus is n-gram-
    # tokenized once, on the exploded probe side only
    toks = F.when(
        F.length(F.trim("text")) == 0, F.expr("array()")
    ).otherwise(F.split(F.lower(F.trim("text")), r"\s+"))
    counts = docs.select(
        "doc_id",
        F.greatest(F.lit(0).cast("long"),
                   (F.size(toks) - F.lit(n - 1)).cast("long"))
        .alias("n_ngrams"))
    return (counts
            .join(hits, "doc_id", "left")
            .select(
                "doc_id", "n_ngrams",
                F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
                F.when(F.col("n_ngrams") > 0,
                       F.round(F.coalesce("n_hits", F.lit(0))
                               / F.col("n_ngrams"), 6))
                 .otherwise(F.lit(0.0)).alias("hit_frac"),
                (F.coalesce("n_hits", F.lit(0)) > 0).cast("int")
                 .alias("contaminated"),
            ))


def sql_decontaminate(corpus_where: str, bench_where: str,
                      n: int = DECON_N, table: str = "documents") -> str:
    return f"""
WITH corpus AS (SELECT * FROM {table} WHERE {corpus_where}),
bench_ngs AS (SELECT DISTINCT ng FROM (
  {_sql_word_ngrams(n, f'(SELECT * FROM {table} WHERE {bench_where})')})),
base AS (
  SELECT doc_id,
         CAST(greatest(0, CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+'))
              END - {n - 1}) AS BIGINT) AS n_ngrams
  FROM corpus),
hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM ({_sql_word_ngrams(n, 'corpus')}) p
  WHERE ng IN (SELECT ng FROM bench_ngs)
  GROUP BY doc_id)
SELECT base.doc_id, n_ngrams,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       CASE WHEN n_ngrams > 0
            THEN round(CAST(coalesce(n_hits, 0) AS DOUBLE) / n_ngrams, 6)
            ELSE 0.0 END AS hit_frac,
       CAST(coalesce(n_hits, 0) > 0 AS INT) AS contaminated
FROM base LEFT JOIN hits USING (doc_id)"""


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET,
                   shards: int = PACK_SHARDS,
                   seed: int = PACK_SEED) -> DataFrame:
    """(doc_id, shard, chunk_idx, tok_from, tok_to): deterministic
    concat-and-chop sequence packing — documents are hashed into
    ``shards`` streams, laid end-to-end in hash order within each
    stream, and chopped every ``budget`` whitespace tokens into
    training chunks.  A document spanning a chunk boundary is split:
    each output row says which token slice [tok_from, tok_to) of the
    doc lands in chunk (shard, chunk_idx).  Invariants: slices of one
    doc are contiguous and sum to its token count; every chunk except
    the last of each shard holds exactly ``budget`` tokens.

    Scale shape: the only sort is a window per shard — shard count is
    the parallelism knob (a 1000-executor run uses thousands of
    shards), exactly the sharded-greedy layout real packing pipelines
    use; placement is a pure function of (doc_id, seed) so retries and
    repartitioning cannot move a document.  Empty docs are dropped.
    """
    base = (docs.select(
                "doc_id", ws_token_count(F.col("text")).alias("n_toks"))
            .filter(F.col("n_toks") >= 1)
            .withColumn("shard",
                        (lcg_hash(F.col("doc_id") + F.lit(seed))
                         % shards).cast("long"))
            .withColumn("ord", lcg_hash(F.col("doc_id") + F.lit(seed + 1))))
    w = (Window.partitionBy("shard").orderBy("ord", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans = (base.withColumn("fin", F.sum("n_toks").over(w))
                 .withColumn("beg", F.col("fin") - F.col("n_toks")))
    b = F.lit(budget)
    chunk = F.explode(F.sequence(
        F.floor(F.col("beg") / b), F.floor((F.col("fin") - 1) / b)))
    return (spans.select("doc_id", "shard", "beg", "fin",
                         chunk.alias("chunk_idx"))
            .select(
                "doc_id", "shard", F.col("chunk_idx").cast("long"),
                (F.greatest(F.col("chunk_idx") * b, F.col("beg"))
                 - F.col("beg")).cast("long").alias("tok_from"),
                (F.least((F.col("chunk_idx") + 1) * b, F.col("fin"))
                 - F.col("beg")).cast("long").alias("tok_to"),
            ))


def sql_pack_sequences(budget: int = PACK_BUDGET, shards: int = PACK_SHARDS,
                       seed: int = PACK_SEED,
                       table: str = "documents") -> str:
    nt = sql_ws_token_count("text")
    return f"""
WITH base AS (
  SELECT doc_id, CAST({nt} AS BIGINT) AS n_toks,
         CAST({sql_lcg_hash(f'(doc_id + {seed})')} % {shards} AS BIGINT)
             AS shard,
         {sql_lcg_hash(f'(doc_id + {seed + 1})')} AS ord
  FROM {table} WHERE {nt} >= 1),
spans AS (
  SELECT doc_id, shard, n_toks,
         CAST(sum(n_toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fin
  FROM base),
s2 AS (SELECT doc_id, shard, fin - n_toks AS beg, fin FROM spans)
SELECT doc_id, shard, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(greatest(ci * {budget}, beg) - beg AS BIGINT) AS tok_from,
       CAST(least((ci + 1) * {budget}, fin) - beg AS BIGINT) AS tok_to
FROM (SELECT *, unnest(generate_series(beg // {budget},
                                       (fin - 1) // {budget})) AS ci
      FROM s2)"""


def sql_scrub_pii(table: str = "documents") -> str:
    t0 = "text"
    t1 = f"regexp_replace({t0}, '{EMAIL_RE}', '<EMAIL>', 'g')"
    t2 = f"regexp_replace({t1}, '{PHONE_RE}', '<PHONE>', 'g')"
    t3 = f"regexp_replace({t2}, '{IPV4_RE}', '<IP>', 'g')"
    return f"""
SELECT doc_id, {t3} AS text,
       CAST(len(regexp_extract_all({t0}, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all({t1}, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all({t2}, '{IPV4_RE}')) AS BIGINT) AS n_ips
FROM {table}"""


N_QUALITY_BUCKETS = 4


def quality_buckets(docs: DataFrame, n_buckets: int = N_QUALITY_BUCKETS,
                    portable: bool = True) -> DataFrame:
    """Data-mixing table: bucket documents by corpus-relative language
    -model quality (char-bigram ``avg_logp`` from
    ``text.char_bigram_lm_scores``) quantile, and report per bucket the
    document count, whitespace-token mass, and score bounds — the table
    a curation pipeline ends with before assigning per-bucket sampling
    weights.  Documents too short to score (< 1 bigram) are excluded.

    ``portable=True`` (verification mode): exact ``ntile`` over
    ``(avg_logp, doc_id)`` — a single global-order window, replayed
    verbatim by the DuckDB twin.  ``portable=False`` (scale path):
    bucket boundaries come from ``approxQuantile`` (Greenwald-Khanna,
    one aggregation, ``n_buckets - 1`` doubles collected to the driver
    and folded back as literal range predicates), so no global sort
    exists at any corpus size; boundary-tied documents may land one
    bucket off versus exact ntile, which mixing weights tolerate.

    Returns ``(bucket, n_docs, n_tokens, min_logp, max_logp)``.
    """
    from .text import char_bigram_lm_scores

    toks = docs.select("doc_id", ws_token_count(F.col("text")).alias("n_toks"))
    scored = (
        char_bigram_lm_scores(docs)
        .filter(F.col("avg_logp").isNotNull())
        .join(toks, "doc_id")
    )
    if portable:
        w = Window.orderBy("avg_logp", "doc_id")
        bucketed = scored.select(
            # long, matching DuckDB ntile (BIGINT) — type-strict oracle
            F.ntile(n_buckets).over(w).cast("long").alias("bucket"),
            "n_toks", "avg_logp")
    else:
        cuts = scored.approxQuantile(
            "avg_logp", [i / n_buckets for i in range(1, n_buckets)], 1e-4)
        if not cuts:
            # no scoreable document (approxQuantile on an empty frame
            # returns []): mirror the portable path's graceful empty
            # result instead of indexing cuts below
            return scored.select(
                F.lit(1).cast("long").alias("bucket"),
                "n_toks", "avg_logp").groupBy(
                "bucket").agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_toks").cast("long").alias("n_tokens"),
                F.round(F.min("avg_logp"), 6).alias("min_logp"),
                F.round(F.max("avg_logp"), 6).alias("max_logp"))
        expr = F.lit(n_buckets)
        for i in range(n_buckets - 1, 0, -1):
            expr = F.when(F.col("avg_logp") <= F.lit(cuts[i - 1]),
                          F.lit(i)).otherwise(expr)
        bucketed = scored.select(expr.cast("long").alias("bucket"),
                                 "n_toks", "avg_logp")
    return (
        bucketed.groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("n_toks").cast("long").alias("n_tokens"),
             F.round(F.min("avg_logp"), 6).alias("min_logp"),
             F.round(F.max("avg_logp"), 6).alias("max_logp"))
    )


def sql_quality_buckets(n_buckets: int = N_QUALITY_BUCKETS,
                        table: str = "documents") -> str:
    """DuckDB twin of ``quality_buckets(portable=True)``."""
    from .text import sql_char_bigram_lm_scores

    lm = sql_char_bigram_lm_scores(table=table)
    return f"""
WITH qtoks AS (SELECT doc_id, {sql_ws_token_count('text')} AS n_toks
               FROM {table}),
qb AS (SELECT ntile({n_buckets}) OVER (ORDER BY s.avg_logp, s.doc_id)
              AS bucket, t.n_toks, s.avg_logp
       FROM ({lm}) s JOIN qtoks t ON t.doc_id = s.doc_id
       WHERE s.avg_logp IS NOT NULL)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       round(min(avg_logp), 6) AS min_logp,
       round(max(avg_logp), 6) AS max_logp
FROM qb GROUP BY bucket"""
