"""Text analysis for training-data pipelines over a `documents` table.

Operators (each JVM-side Catalyst expressions — no Python in the hot
path; every regex / constant is shared with a DuckDB-replayable SQL twin
so the driver's oracle can verify values):

- token counting: whitespace tokens + a BPE-ish regex tokenizer;
- language ID: stopword-hit n-gram heuristic over {en,de,es,fr};
- quality scoring: length / alphabetic / punctuation / stopword ratios
  combined into one bounded score;
- document fingerprinting: min-of-window-hashes (winnowing-style) over
  character k-grams.

The reference has no text subsystem (it is a graph engine); these are
the training-data-pipeline extensions required by the project brief.
All operators are narrow per-row column work: they pipeline into the
parquet scan with zero shuffle and scale linearly with input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- shared constants (single source of truth for Spark exprs + oracle SQL)

BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "es": ["el", "los", "que", "por", "con", "para", "una", "como", "pero", "sus"],
    "fr": ["le", "les", "et", "des", "une", "est", "dans", "pour", "qui", "pas"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic tie-break priority

FINGERPRINT_K = 8  # char-window width for fingerprinting


def _stop_re(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


# -- Spark column expressions ------------------------------------------------

def ws_token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    return F.regexp_count(text, F.lit(BPE_RE)).cast("long")


def stopword_hits(text: Column, lang: str) -> Column:
    return F.regexp_count(F.lower(text), F.lit(_stop_re(lang))).cast("long")


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties break by LANG_ORDER;
    zero hits everywhere -> 'und' (undetermined)."""
    scores = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(LANG_ORDER):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    a = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(a.cast("double") / n)


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def quality_score(text: Column) -> Column:
    """Bounded [0,1] quality heuristic:
    0.4*min(tokens/64,1) + 0.4*alpha_ratio + 0.2*min(4*en_stop_ratio,1).
    """
    toks = ws_token_count(text)
    stop_ratio = F.when(toks == 0, F.lit(0.0)).otherwise(
        stopword_hits(text, "en").cast("double") / toks
    )
    return (
        F.lit(0.4) * F.least(toks.cast("double") / 64.0, F.lit(1.0))
        + F.lit(0.4) * alpha_ratio(text)
        + F.lit(0.2) * F.least(F.lit(4.0) * stop_ratio, F.lit(1.0))
    )


def fingerprint(text: Column) -> Column:
    """Winnowing-style fingerprint: min over md5 of all K-char windows
    (md5 of the whole text when shorter than K).  Equal fingerprints are
    near-duplicate candidates; exact duplicates always collide."""
    k = FINGERPRINT_K
    win = F.expr(
        f"array_min(transform(sequence(1, length(text) - {k - 1}),"
        f" i -> md5(substring(text, i, {k}))))"
    )
    return F.when(F.length(text) < k, F.md5(text)).otherwise(win)


# -- DuckDB oracle SQL twins -------------------------------------------------

def sql_ws_token_count(col: str = "text") -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 ELSE "
        f"len(regexp_split_to_array(trim({col}), '\\s+')) END"
    )


def sql_bpe_token_count(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{BPE_RE}'))"


def sql_stopword_hits(lang: str, col: str = "text") -> str:
    return f"len(regexp_extract_all(lower({col}), '{_stop_re(lang)}'))"


def sql_lang_id(col: str = "text") -> str:
    s = {lang: sql_stopword_hits(lang, col) for lang in LANG_ORDER}
    best = "greatest(" + ", ".join(s.values()) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in LANG_ORDER:
        case += f"WHEN {s[lang]} = {best} THEN '{lang}' "
    return case + "ELSE 'und' END"


def sql_alpha_ratio(col: str = "text") -> str:
    return (
        f"CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
        f"CAST(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
        f" / length({col}) END"
    )


def sql_quality_score(col: str = "text") -> str:
    toks = sql_ws_token_count(col)
    stops = sql_stopword_hits("en", col)
    stop_ratio = f"CASE WHEN {toks} = 0 THEN 0.0 ELSE CAST({stops} AS DOUBLE) / {toks} END"
    return (
        f"0.4 * least(CAST({toks} AS DOUBLE) / 64.0, 1.0)"
        f" + 0.4 * {sql_alpha_ratio(col)}"
        f" + 0.2 * least(4.0 * ({stop_ratio}), 1.0)"
    )


def sql_fingerprint(col: str = "text") -> str:
    k = FINGERPRINT_K
    return (
        f"CASE WHEN length({col}) < {k} THEN md5({col}) ELSE "
        f"list_min([md5(substr({col}, i, {k}))"
        f" for i in generate_series(1, length({col}) - {k - 1})]) END"
    )


# -- vocabulary / token frequency -------------------------------------------

def token_frequencies(docs, min_count: int = 2):
    """Corpus vocabulary with frequencies: (tok, n_docs, n_total) for
    lowercase whitespace tokens occurring >= min_count times — the
    vocab-building pass of a training-data pipeline.  One explode + one
    grouped aggregation (partial+final; hot tokens are exactly the
    skew case map-side combine absorbs)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    return (
        toks.groupBy("tok")
        .agg(F.count_distinct("doc_id").alias("n_docs"),
             F.count("*").alias("n_total"))
        .filter(F.col("n_total") >= min_count)
    )


def sql_token_frequencies(min_count: int = 2, table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
    FROM {table}) WHERE length(tok) > 0)
SELECT tok, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total
FROM toks GROUP BY tok HAVING count(*) >= {min_count}
"""


def winnowing_fingerprints(docs, k: int = FINGERPRINT_K, w: int = 4):
    """Proper winnowing (Schleimer et al. 2003): md5 each K-char gram,
    take the minimum of every W-gram sliding window, emit the DISTINCT
    selected fingerprints per doc.  Shared fingerprints between docs
    are near-dup evidence robust to insertions (unlike the single
    min-hash of `fingerprint`).

    The gram array is materialized as its own projection first:
    inlining it into the window expression makes Catalyst recompute
    the md5 array once per window (O(len*w) hashing — measured 40x
    slower)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length(text) - {k - 1}, 1)),"
        f" i -> md5(substring(text, i, {k})))"
    )
    with_g = docs.select("doc_id", grams.alias("g"))
    windows = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(g) - {w - 1}, 1)),"
        f" j -> array_min(slice(g, j, {w}))))"
    )
    return with_g.select("doc_id", F.explode(windows).alias("fp"))


def sql_winnowing_fingerprints(k: int = FINGERPRINT_K, w: int = 4,
                               table: str = "documents") -> str:
    return f"""
WITH grams AS (
  SELECT doc_id,
         [md5(substr(text, i, {k}))
          for i in generate_series(1, greatest(length(text) - {k - 1}, 1))] AS g
  FROM {table})
SELECT DISTINCT doc_id,
       unnest([list_min(g[j:j+{w - 1}])
               for j in generate_series(1, greatest(len(g) - {w - 1}, 1))]) AS fp
FROM grams
"""


REP_N = 3  # word n-gram order for the repetition signal


def repetition_signals(docs, n: int = REP_N):
    """Gopher-style repetition quality signals, per document:
    ``(doc_id, n_toks, dup_unigram_frac, top_ngram_frac,
    top_ngram_char_frac)`` — repeated-content fractions used to filter
    boilerplate/spam out of LLM training corpora (Rae et al. 2021,
    "Scaling Language Models", §A1.1):

    - ``dup_unigram_frac``: fraction of tokens whose (lowercased)
      token occurs more than once in the document;
    - ``top_ngram_frac``: occurrences of the most frequent word
      n-gram / total n-grams;
    - ``top_ngram_char_frac``: characters covered by occurrences of
      that n-gram / total characters.

    The most-frequent n-gram tie-breaks deterministically to the
    lexicographically largest via ``max(struct(count, ngram))`` — no
    window sort.  Scale shape: two explode + partial/final hash
    aggregations keyed by (doc_id, gram); the per-key domain is
    bounded per document, so there is no corpus-wide hot key.  Docs
    with fewer than ``n`` tokens report 0.0 n-gram fractions.
    """
    toks_arr = F.when(
        F.length(F.trim("text")) == 0, F.expr("array()")
    ).otherwise(F.split(F.lower(F.trim("text")), r"\s+"))
    base = docs.select(
        "doc_id", F.length("text").alias("n_chars"), toks_arr.alias("toks")
    ).select("doc_id", "n_chars", "toks",
             # long, matching DuckDB len() (BIGINT) — type-strict oracle
             F.size("toks").cast("long").alias("n_toks"))
    uni = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
              / F.sum("c")).alias("dup_uni"))
    )
    ngram_expr = F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> array_join(slice(toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    top = (
        base.select("doc_id", F.explode(ngram_expr).alias("ng"))
        .groupBy("doc_id", "ng").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("total_ng"),
             F.max(F.struct(F.col("c"), F.col("ng"))).alias("top"))
    )
    return (
        base.join(uni, "doc_id", "left").join(top, "doc_id", "left")
        .select(
            "doc_id", "n_toks",
            F.round(F.coalesce("dup_uni", F.lit(0.0)), 6)
             .alias("dup_unigram_frac"),
            F.round(F.coalesce(F.col("top.c") / F.col("total_ng"),
                               F.lit(0.0)), 6).alias("top_ngram_frac"),
            F.round(F.coalesce(
                F.col("top.c") * F.length(F.col("top.ng"))
                / F.col("n_chars"), F.lit(0.0)), 6)
             .alias("top_ngram_char_frac"),
        )
    )


def sql_repetition_signals(n: int = REP_N, table: str = "documents") -> str:
    return f"""
WITH base AS (
  SELECT doc_id, length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS toks
  FROM {table}),
b2 AS (SELECT doc_id, n_chars, toks, len(toks) AS n_toks FROM base),
uni AS (
  SELECT doc_id, CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                 / sum(c) AS dup_uni
  FROM (SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM b2)
        GROUP BY doc_id, tok)
  GROUP BY doc_id),
ngc AS (
  SELECT doc_id, ng, count(*) AS c FROM (
    SELECT doc_id,
           unnest([array_to_string(list_slice(toks, i, i + {n - 1}), ' ')
                   for i in generate_series(1, len(toks) - {n - 1})]) AS ng
    FROM b2 WHERE len(toks) >= {n})
  GROUP BY doc_id, ng),
top AS (
  SELECT doc_id, sum(c) AS total_ng,
         max(struct_pack(c := c, ng := ng)) AS top
  FROM ngc GROUP BY doc_id)
SELECT b2.doc_id, n_toks,
       round(coalesce(uni.dup_uni, 0.0), 6) AS dup_unigram_frac,
       round(coalesce(CAST(top.top.c AS DOUBLE) / top.total_ng, 0.0), 6)
           AS top_ngram_frac,
       round(coalesce(CAST(top.top.c AS DOUBLE) * length(top.top.ng)
                      / b2.n_chars, 0.0), 6) AS top_ngram_char_frac
FROM b2 LEFT JOIN uni USING (doc_id) LEFT JOIN top USING (doc_id)"""


def char_bigram_lm_scores(docs, alpha: float = 0.5):
    """(doc_id, n_bigrams, avg_logp): per-character-bigram average
    log-probability of each document under the corpus's own
    add-alpha-smoothed char-bigram model — the language-model quality
    filter of a training-data pipeline (documents scoring far below
    the corpus norm are boilerplate, garbled encodings, or wrong-
    language contamination).

    Scale shape: two corpus passes (bigram counts, then first-char
    totals), both partial+final hash aggregations; the per-doc scoring
    join fans out on the bigram key, whose domain is tiny (|charset|^2)
    and hot — exactly what map-side combine absorbs.  Documents
    shorter than one bigram keep NULL avg_logp.
    """
    bgs = docs.filter(F.length("text") >= 2).select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, length(lower(text)) - 1),"
            " i -> substring(lower(text), i, 2))")).alias("bg"))
    counts = bgs.groupBy("bg").agg(F.count("*").alias("n"))
    c1 = counts.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("n").alias("n1"))
    v = counts.select(
        F.substring("bg", 2, 1).alias("c2")).distinct().count()
    probs = (
        counts.withColumn("c1", F.substring("bg", 1, 1))
        .join(c1, "c1")
        .select("bg", ((F.col("n") + F.lit(alpha))
                       / (F.col("n1") + F.lit(alpha * v))).alias("p"))
    )
    scored = (
        bgs.join(probs, "bg")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.round(F.avg(F.log("p")), 6).alias("avg_logp"))
    )
    return (
        docs.select("doc_id").join(scored, "doc_id", "left")
        .select("doc_id",
                F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                "avg_logp")
    )


def sql_char_bigram_lm_scores(alpha: float = 0.5,
                              table: str = "documents") -> str:
    return f"""
WITH bgs AS (
  SELECT doc_id, unnest([substring(lower(text), i, 2)
          for i in generate_series(1, length(lower(text)) - 1)]) AS bg
  FROM {table} WHERE length(text) >= 2),
counts AS (SELECT bg, count(*) AS n FROM bgs GROUP BY bg),
c1 AS (SELECT substring(bg, 1, 1) AS c1, CAST(sum(n) AS DOUBLE) AS n1
       FROM counts GROUP BY 1),
v AS (SELECT count(DISTINCT substring(bg, 2, 1)) AS v FROM counts),
probs AS (SELECT co.bg,
                 (co.n + {alpha!r}) / (c1.n1 + {alpha!r} * (SELECT v FROM v))
                     AS p
          FROM counts co JOIN c1 ON c1.c1 = substring(co.bg, 1, 1)),
scored AS (SELECT b.doc_id, count(*) AS n_bigrams,
                  round(avg(ln(p.p)), 6) AS avg_logp
           FROM bgs b JOIN probs p ON p.bg = b.bg GROUP BY b.doc_id)
SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams, s.avg_logp
FROM {table} d LEFT JOIN scored s ON s.doc_id = d.doc_id"""


# -- BM25 ranking -------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(docs, terms: list[str], k1: float = BM25_K1,
                b: float = BM25_B):
    """Okapi BM25 scores of every document against a fixed term set —
    the relevance-ranking pass of a corpus curation / retrieval
    pipeline (idf uses the Robertson ``ln(1 + (N-df+.5)/(df+.5))``
    form, always positive).

    Returns ``(doc_id, score double)`` for docs matching >=1 term.

    Scale shape: tokens are filtered to the query terms BEFORE any
    aggregation (the scan emits ~|terms| rows per doc, not |tokens|);
    the per-term df table and the 1-row corpus stats are broadcast;
    the only |corpus|-sized shuffles are the two doc-keyed groupBys,
    both with map-side partial aggregation.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"),
                   F.count("*").alias("n_docs"))
    tf = (toks.filter(F.col("tok").isin(list(terms)))
          .groupBy("doc_id", "tok").agg(F.count("*").alias("tf")))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    return (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * norm).alias("s"))
        .groupBy("doc_id").agg(F.sum("s").alias("score"))
    )


def sql_bm25(terms: list[str], k1: float = BM25_K1, b: float = BM25_B,
             table: str = "documents") -> str:
    # terms come from user input: escape embedded single quotes
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
    FROM {table}) WHERE length(tok) > 0),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
       WHERE tok IN ({quoted}) GROUP BY doc_id, tok)
, df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
SELECT tf.doc_id,
       round(sum(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * ({k1!r} + 1.0))
                 / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl.dl / s.avgdl))), 6)
           AS score
FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats s
GROUP BY tf.doc_id"""
