"""Corpus-curation operators: deterministic sampling + PII scrubbing.

The last mile of a training-data pipeline after dedup/quality scoring:
pick a reproducible subset (optionally with per-stratum rates — e.g.
keep 100% of high-quality docs, 10% of mid, 0% of low) and redact
obvious PII spans.  All pure column expressions with DuckDB-replayable
SQL twins (the portability rule from ``operators/portable``):

- ``hash_sample`` / ``stratified_sample``: membership decided by a
  2-round LCG hash of the document id — the SAME rows are kept on any
  engine, any partitioning, any run (never ``rand()``, which Spark
  re-rolls per task retry);
- ``scrub_pii``: email / phone / IPv4 redaction via regexes restricted
  to the RE2-safe subset (char classes, bounded repeats, ``\\b``) so
  Spark's Java regex and DuckDB's RE2 agree byte-for-byte.

Scale shape: everything pipelines into the scan — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.portable import M, lcg_hash, sql_lcg_hash

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
        f"WHEN {stratum_col} = '{v}' THEN {float(r)!r}"
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
